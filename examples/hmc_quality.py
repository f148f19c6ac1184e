"""HMC adaptation-quality comparison on a GP hyperposterior.

Compares mass-matrix and trajectory-length configs of the framework's HMC
sampler — the DEFAULT (50%-jittered L=16, dense full-covariance inverse
mass, late-window adaptation) against longer/unjittered lengths, a diagonal
mass, and round 2's from-step-0 pooled-diag behavior — in
min-ESS per leapfrog gradient evaluation (the compute-normalized quality
metric NUTS papers report) and max split-R-hat, averaged over 3 seeds
(single-seed HMC quality metrics are chaotic-trajectory noise).

History: round 2 hard-wired jittered trajectories and from-step-0 pooled
diagonal mass (measured 0.61 ESS/1k-gradients, R-hat 1.36); round 3 made
the measured-best configs the defaults, selectable via the public
``num_leapfrog`` / ``trajectory_jitter`` / ``mass_decay`` /
``mass_matrix`` knobs.

Writes examples/hmc_quality_results.json (key "default_jittered_dense_L16"
= the shipped configuration).

Run:  JAX_PLATFORMS=cpu python examples/hmc_quality.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        jax.config.update("jax_platforms", "cpu")
    from fastgaussianprocesses_tpu import FastGPLattice
    from fastgaussianprocesses_tpu.fit.hmc import sample_gp_hyperposterior

    gp = FastGPLattice(3, seed_for_seq=7)
    x = np.asarray(gp.get_x_next(256))
    gp.add_y_next(jnp.asarray(np.sin(2 * np.pi * x[:, 0]) + x.sum(1)))

    num_samples, num_warmup, chains = 400, 400, 8
    seeds = (11, 12, 13, 14, 15, 16)  # HMC trajectories are chaotic:
    # single-seed quality metrics vary wildly between bitwise-perturbed
    # builds, so each config is averaged over >= 6 seeds (max_rhat reported
    # as the worst seed); round 4's committed artifact had only 3 seeds
    # while the docstring claimed 6 (round-4 ADVICE)
    configs = [
        # the round-5 shipped defaults: ChEES trajectory-time adaptation
        # (Hoffman et al. 2021) seeded at T0 = eps0*32, ta=0.9, dense mass
        ("default_chees_dense", {}),
        # ablations: smaller T0 seed (one seed sticks), diag mass (ridge)
        ("chees_T0_16", {"num_leapfrog": 16, "target_accept": 0.8}),
        ("chees_diag", {"mass_matrix": "diag"}),
        # round-4 default: 50%-jittered fixed L=16, dense mass
        ("round4_jittered_dense_L16", {"trajectory_adapt": "fixed",
                                       "num_leapfrog": 16,
                                       "target_accept": 0.8}),
        ("fixed_L32_dense", {"trajectory_adapt": "fixed", "num_leapfrog": 32,
                             "trajectory_jitter": 0.0, "target_accept": 0.8}),
        # round-2 behavior: jittered + diag mass pooled from step 0
        ("round2_pooled_diag", {"trajectory_adapt": "fixed",
                                "num_leapfrog": 16, "target_accept": 0.8,
                                "mass_matrix": "diag", "mass_decay": 1.0,
                                "mass_warmup_start_frac": 0.0}),
    ]
    results = {}
    for label, kw in configs:
        ess_eff, rhats, accepts, mean_Ls = [], [], [], []
        for seed in seeds:
            res, diags = sample_gp_hyperposterior(
                gp, num_samples=num_samples, num_warmup=num_warmup,
                num_chains=chains, seed=seed, **kw)
            # grad evals from the MEASURED mean leapfrog count (exact for
            # adaptive trajectories; 2 gradient evals per leapfrog step in
            # this implementation plus the 2 endpoint evals)
            mean_steps = res.mean_leapfrog
            grad_evals = (num_samples + num_warmup) * chains * (2 * mean_steps + 2)
            min_ess = min(d["ess"] for d in diags.values())
            ess_eff.append(1000 * min_ess / grad_evals)
            rhats.append(max(d["rhat"] for d in diags.values()))
            accepts.append(float(res.accept_rate))
            mean_Ls.append(mean_steps)
        import numpy as _np
        results[label] = {
            "ess_per_1k_grad_evals_mean": round(float(_np.mean(ess_eff)), 3),
            "max_rhat_worst_seed": round(float(_np.max(rhats)), 4),
            "max_rhat_per_seed": [round(r, 4) for r in rhats],
            "accept_mean": round(float(_np.mean(accepts)), 3),
            "mean_leapfrog": round(float(_np.mean(mean_Ls)), 2),
        }
        print(label, json.dumps(results[label]), flush=True)

    out = os.path.join(os.path.dirname(__file__), "hmc_quality_results.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    best = min(v["max_rhat_worst_seed"] for v in results.values())
    print("default_chees_dense worst-seed max_rhat:",
          results["default_chees_dense"]["max_rhat_worst_seed"],
          "(best column:", best, ")")


if __name__ == "__main__":
    main()
