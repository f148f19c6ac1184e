"""The probnum25 scaling sweep: fit-time and accuracy vs dimension and n.

Reproduces the protocol of the reference's probnum25 notebook cells 16-17
(/root/reference/docs/examples/probnum25_paper/probnum25_paper.ipynb:
Styblinski–Tang, d in 2^{0..4}, n in 2^{2..9}; the reference repo saves no
numbers for this sweep — the protocol itself is the spec).  For each (d, n):
FastGPLattice alpha=2, default fit with early stopping, per-step wall time,
and L2 relative error on 2^12 Halton (seed 17) test points.

Writes SCALING_SWEEP.json at the repo root.

Run:  JAX_PLATFORMS=cpu python examples/scaling_sweep.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        jax.config.update("jax_platforms", "cpu")
    from fastgaussianprocesses_tpu import FastGPLattice, Halton
    from fastgaussianprocesses_tpu.utils.test_functions import styblinski_tang

    results = {}
    for d in (1, 2, 4, 8, 16):
        xt = np.asarray(Halton(d, seed=17)(0, 1 << 12))
        yt = np.asarray(styblinski_tang(jnp.asarray(xt)))
        for m in range(2, 10):
            n = 1 << m
            gp = FastGPLattice(d, seed_for_seq=7, alpha=2)
            x = gp.get_x_next(n)
            gp.add_y_next(jnp.asarray(styblinski_tang(jnp.asarray(np.asarray(x)))))
            t0 = time.perf_counter()
            data = gp.fit(verbose=0)
            t_per_step = (time.perf_counter() - t0) / max(data["iterations"], 1)
            pm = np.asarray(gp.post_mean(xt))
            l2 = float(np.linalg.norm(yt - pm) / np.linalg.norm(yt))
            results[f"d{d}_n{n}"] = {"time_per_step": round(t_per_step, 5),
                                     "l2_rel_err": round(l2, 6),
                                     "fit_iterations": int(data["iterations"])}
            print(f"d={d} n={n}", json.dumps(results[f"d{d}_n{n}"]), flush=True)
    out = os.path.join(os.path.dirname(__file__), "..", "SCALING_SWEEP.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", os.path.abspath(out))


if __name__ == "__main__":
    main()
