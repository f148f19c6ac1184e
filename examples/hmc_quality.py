"""HMC adaptation-quality comparison on a GP hyperposterior.

Compares the framework's jittered-leapfrog HMC (trajectory length uniform in
[L/2, L] — the TPU-friendly NUTS substitute: no data-dependent control flow,
whole sampler is one fused scan) against fixed-length leapfrog baselines, in
min-ESS per leapfrog gradient evaluation (the compute-normalized quality
metric NUTS papers report).

Writes examples/hmc_quality_results.json.

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
    from fastgaussianprocesses_tpu.fit import hmc as H

    gp = FastGPLattice(3, seed_for_seq=7)
    x = np.asarray(gp.get_x_next(256))
    gp.add_y_next(jnp.asarray(np.sin(2 * np.pi * x[:, 0]) + x.sum(1)))

    num_samples, num_warmup, chains = 400, 400, 8
    results = {}
    for label, num_leapfrog, jitter in [
        ("jittered_L16", 16, True),
        ("fixed_L16", 16, False),
        ("fixed_L8", 8, False),
        ("fixed_L32", 32, False),
    ]:
        # the jitter switch: monkeypatch-free — num_leapfrog//2 == num_leapfrog
        # start disables the randomization (see fit/hmc.py step())
        import fastgaussianprocesses_tpu.fit.hmc as hmc_mod
        orig = hmc_mod.hmc

        def run():
            res, diags = hmc_mod.sample_gp_hyperposterior(
                gp, num_samples=num_samples, num_warmup=num_warmup,
                num_chains=chains, seed=11)
            return res, diags

        if not jitter:
            # fixed trajectories: jitter window collapsed to [L, L]
            import functools
            hmc_mod.hmc = functools.partial(orig, num_leapfrog=num_leapfrog)
            # temporarily collapse the jitter window by patching randint
            real_randint = jax.random.randint

            def fixed_randint(key, shape, lo, hi, **kw):
                return jnp.full(shape, num_leapfrog, dtype=jnp.int32) - 1
            jax.random.randint = fixed_randint
            try:
                res, diags = run()
            finally:
                jax.random.randint = real_randint
                hmc_mod.hmc = orig
        else:
            import functools
            hmc_mod.hmc = functools.partial(orig, num_leapfrog=num_leapfrog)
            try:
                res, diags = run()
            finally:
                hmc_mod.hmc = orig

        mean_steps = (1 + (num_leapfrog // 2 + num_leapfrog + 1) / 2) if jitter \
            else num_leapfrog
        grad_evals = (num_samples + num_warmup) * chains * (2 * mean_steps + 2)
        min_ess = min(d["ess"] for d in diags.values())
        max_rhat = max(d["rhat"] for d in diags.values())
        results[label] = {
            "min_ess": round(min_ess, 1),
            "max_rhat": round(max_rhat, 4),
            "accept": round(float(res.accept_rate), 3),
            "ess_per_1k_grad_evals": round(1000 * min_ess / grad_evals, 3),
        }
        print(label, json.dumps(results[label]), flush=True)

    out = os.path.join(os.path.dirname(__file__), "hmc_quality_results.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
