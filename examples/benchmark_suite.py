"""Reproduction of the reference's probnum25 benchmark protocol.

5 test functions x 3 GP types x {f only, (f, grad f)}: per-step fit time,
L2 relative error on 2^12 scrambled-Halton test points, and attained MLL
(reference: docs/examples/probnum25_paper/probnum25_paper.ipynb cell 8;
published tables BASELINE.md).

Run:  python examples/benchmark_suite.py [--n 1024] [--iterations 50] [--grad]
"""

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fastgaussianprocesses_tpu import (FastGPDigitalNetB2, FastGPLattice, Halton,
                                       StandardGP)
from fastgaussianprocesses_tpu.utils.test_functions import SUITE, gradient


def run_one(model_name, fname, f, d, n, iterations, use_grad, seed=7):
    kwargs = {}
    if use_grad:
        derivs = [np.zeros((1, d), dtype=np.int64)] + [e[None, :] for e in np.eye(d, dtype=np.int64)]
        kwargs["derivatives"] = derivs
        num_tasks = d + 1
    else:
        num_tasks = None
    if model_name == "lattice":
        gp = FastGPLattice(d, num_tasks=num_tasks, seed_for_seq=seed, alpha=2, **kwargs)
    elif model_name == "dnb2":
        gp = FastGPDigitalNetB2(d, num_tasks=num_tasks, seed_for_seq=seed, alpha=2, **kwargs)
    else:
        gp = StandardGP(d, num_tasks=num_tasks, seed_for_seq=seed, **kwargs)
    gf = gradient(f) if use_grad else None
    if use_grad:
        tasks = list(range(d + 1))
        xs = gp.get_x_next([n] * (d + 1), tasks)
        ys = [jnp.asarray(f(jnp.asarray(np.asarray(xs[0]))))]
        for j in range(d):
            ys.append(jnp.asarray(gf(jnp.asarray(np.asarray(xs[j + 1])))[:, j]))
        gp.add_y_next(ys, tasks)
    else:
        x = gp.get_x_next(n)
        gp.add_y_next(jnp.asarray(f(jnp.asarray(np.asarray(x)))))
    t0 = time.perf_counter()
    data = gp.fit(iterations=iterations, verbose=0)
    t_per_step = (time.perf_counter() - t0) / max(data["iterations"], 1)
    xt = np.asarray(Halton(d, seed=11)(0, 1 << 12))
    yt = np.asarray(f(jnp.asarray(xt)))
    pm = np.asarray(gp.post_mean(xt, task=0) if use_grad else gp.post_mean(xt))
    l2 = float(np.linalg.norm(yt - pm) / np.linalg.norm(yt))
    solver = gp._solver()
    norm, logdet = solver.norm_logdet_terms()
    ntot = float(gp.n.sum())
    mll = float(-0.5 * (np.asarray(norm).sum() + np.asarray(logdet).sum()
                        + ntot * np.log(2 * np.pi)))
    return {"time_per_step": t_per_step, "l2_rel_err": l2, "mll": mll}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 10)
    ap.add_argument("--iterations", type=int, default=50)
    ap.add_argument("--grad", action="store_true", help="also run derivative-informed variants")
    ap.add_argument("--models", default="lattice,dnb2,standard")
    args = ap.parse_args()
    results = {}
    for fname, (f, d) in SUITE.items():
        for model in args.models.split(","):
            if model == "standard" and args.n > (1 << 12):
                continue
            for use_grad in ([False, True] if args.grad else [False]):
                key = f"{fname}/{model}" + ("/grad" if use_grad else "")
                try:
                    r = run_one(model, fname, f, d, args.n, args.iterations, use_grad)
                except Exception as e:  # keep the sweep going
                    r = {"error": str(e)[:100]}
                results[key] = r
                print(key, json.dumps(r), flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
