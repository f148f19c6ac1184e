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
    seeds = (11, 12, 13)  # HMC trajectories are chaotic: single-seed quality
    # metrics vary wildly between bitwise-perturbed builds, so each config
    # is averaged over seeds (max_rhat reported as the worst seed)
    DEFAULT_JITTER = 0.5  # keep in sync with sample_gp_hyperposterior
    configs = [
        ("default_jittered_dense_L16", {}),  # the shipped defaults (round 4)
        ("fixed_L16_dense", {"trajectory_jitter": 0.0}),
        ("jittered_dense_L32", {"num_leapfrog": 32}),
        ("fixed_L32_dense", {"num_leapfrog": 32, "trajectory_jitter": 0.0}),
        ("jittered_diag_L16", {"mass_matrix": "diag"}),
        # round-2 behavior: jittered + diag mass pooled from step 0
        ("round2_pooled_diag", {"mass_matrix": "diag", "mass_decay": 1.0,
                                "mass_warmup_start_frac": 0.0}),
    ]
    results = {}
    for label, kw in configs:
        ess_eff, rhats, accepts = [], [], []
        for seed in seeds:
            res, diags = sample_gp_hyperposterior(
                gp, num_samples=num_samples, num_warmup=num_warmup,
                num_chains=chains, seed=seed, **kw)
            L = kw.get("num_leapfrog", 16)
            jit_frac = kw.get("trajectory_jitter", DEFAULT_JITTER)
            mean_steps = L * (1 - jit_frac / 2)  # uniform on [L*(1-j), L]
            grad_evals = (num_samples + num_warmup) * chains * (2 * mean_steps + 2)
            min_ess = min(d["ess"] for d in diags.values())
            ess_eff.append(1000 * min_ess / grad_evals)
            rhats.append(max(d["rhat"] for d in diags.values()))
            accepts.append(float(res.accept_rate))
        import numpy as _np
        results[label] = {
            "ess_per_1k_grad_evals_mean": round(float(_np.mean(ess_eff)), 3),
            "max_rhat_worst_seed": round(float(_np.max(rhats)), 4),
            "max_rhat_per_seed": [round(r, 4) for r in rhats],
            "accept_mean": round(float(_np.mean(accepts)), 3),
        }
        print(label, json.dumps(results[label]), flush=True)

    out = os.path.join(os.path.dirname(__file__), "hmc_quality_results.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    best = min(v["max_rhat_worst_seed"] for v in results.values())
    print("default worst-seed max_rhat:",
          results["default_jittered_dense_L16"]["max_rhat_worst_seed"],
          "(best column:", best, ")")


if __name__ == "__main__":
    main()
