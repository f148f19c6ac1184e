"""Reproduction of the reference's probnum25 benchmark protocol.

5 test functions x 3 GP types x {f only, (f, grad f)}: per-step fit time,
L2 relative error on 2^12 Halton (seed 17) test points, and best attained
MLL.  Protocol mirrors docs/examples/probnum25_paper/probnum25_paper.ipynb
cell 15 exactly:

* "SE" = StandardGP on rank-1 LATTICE points (seed 7), Gaussian kernel;
* "SI" = FastGPLattice alpha=2; "DSI" = FastGPDigitalNetB2 alpha=4 (DS);
* fit() with default iterations (5000) and default early stopping;
* grad variant: d+1 tasks with derivative multi-indices [0, e_1, ..., e_d];
* Baker (tent) transform applied to the LATTICE model for Branin/Hartmann
  grad runs (the reference's `bake_grad` flags), with the folded posterior
  mean (gp.post_mean(x/2) + gp.post_mean(1-x/2))/2 at query time;
* reported MLL = max over the fit history (loss_hist).

Published numbers to compare against: BASELINE.md.

Run:  python examples/benchmark_suite.py [--n 1024] [--grad] [--platform cpu]
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

from fastgaussianprocesses_tpu import (DigitalNetB2, FastGPDigitalNetB2, FastGPLattice, Halton,
                                       StandardGP)
from fastgaussianprocesses_tpu.points.lattice import LatticeSeq
from fastgaussianprocesses_tpu.utils.test_functions import SUITE, gradient

# which functions get the Baker transform on the lattice model (reference
# probnum25 cell 15 `funcs` tuples: (bake, bake_grad))
BAKE = {"ackley_d1": (False, False), "branin": (False, True),
        "camel": (False, False), "stytang": (False, False),
        "hartmann": (False, True)}


def make_gp(model_name, d, num_tasks, derivs, seed=7, init=None):
    kwargs = {} if derivs is None else {"derivatives": derivs}
    if init is not None:
        kwargs["lengthscales"], kwargs["scale"] = init
    nt = 1 if num_tasks is None else num_tasks
    # the reference builds EVERY task's sequence with the SAME seed
    # (probnum25 cell 15: `[qp.Lattice(d, seed=7) for i in ...]` and
    # asserts all tasks share identical x) — derivative tasks observe
    # (f, grad f) at the SAME locations.  Round 5 found our per-task
    # spawned seeds broke this protocol for the grad cells.
    if model_name == "lattice":
        seqs = [LatticeSeq(d, seed=seed, randomize="SHIFT") for _ in range(nt)]
        return FastGPLattice(seqs if nt > 1 else seqs[0], num_tasks=num_tasks,
                             alpha=2, **kwargs)
    if model_name == "dnb2":
        # reference uses alpha=4 digital nets (randomize="DS") in this protocol
        seqs = [DigitalNetB2(d, seed=seed, randomize="DS") for _ in range(nt)]
        return FastGPDigitalNetB2(seqs if nt > 1 else seqs[0],
                                  num_tasks=num_tasks, alpha=4, **kwargs)
    # "SE lattice": StandardGP on rank-1 lattice points, one sequence per task
    seqs = [LatticeSeq(d, seed=seed) for _ in range(nt)]
    return StandardGP(seqs if nt > 1 else seqs[0], num_tasks=num_tasks, **kwargs)


def run_one(model_name, fname, f, d, n, iterations, use_grad, seed=7,
            init=None, cv_holdout=False):
    bake = BAKE.get(fname, (False, False))[1 if use_grad else 0] and \
        model_name == "lattice"
    f_tf = (lambda x: f(1 - 2 * jnp.abs(x - 0.5))) if bake else f
    if use_grad:
        derivs = [np.zeros((1, d), dtype=np.int64)] + \
            [e[None, :] for e in np.eye(d, dtype=np.int64)]
        num_tasks = d + 1
    else:
        derivs, num_tasks = None, None
    gp = make_gp(model_name, d, num_tasks, derivs, seed, init=init)
    if model_name == "standard" and use_grad and d >= 6:
        # the (d+1)-task dense system is n*(d+1) = 7168 wide; full-history
        # fitting is hours on this 2-core CPU — cap iterations (noted in
        # BASELINE_REPRO.md; accuracy is already converged well before this)
        iterations = min(iterations, 25)
    gf = gradient(f_tf) if use_grad else None
    if use_grad:
        tasks = list(range(d + 1))
        xs = gp.get_x_next([n] * (d + 1), tasks)
        ys = [jnp.asarray(f_tf(jnp.asarray(np.asarray(xs[0]))))]
        for j in range(d):
            ys.append(jnp.asarray(gf(jnp.asarray(np.asarray(xs[j + 1])))[:, j]))
        gp.add_y_next(ys, tasks)
    else:
        x_full = gp.get_x_next(n)
        y_full = jnp.asarray(f_tf(jnp.asarray(np.asarray(x_full))))
        gp.add_y_next(y_full)
    t0 = time.perf_counter()
    data = gp.fit(iterations=iterations, verbose=0, store_loss_hist=True)
    t_per_step = (time.perf_counter() - t0) / max(data["iterations"], 1)
    xt = np.asarray(Halton(d, seed=17)(0, 1 << 12))
    yt = np.asarray(f(jnp.asarray(xt)))
    task_kw = {"task": 0} if use_grad else {}
    if bake:
        pm = 0.5 * (np.asarray(gp.post_mean(xt / 2, **task_kw))
                    + np.asarray(gp.post_mean(1 - xt / 2, **task_kw)))
    else:
        pm = np.asarray(gp.post_mean(xt, **task_kw))
    l2 = float(np.linalg.norm(yt - pm) / np.linalg.norm(yt))
    mll = float(np.max(data["loss_hist"]))  # fit stores -loss for MLL
    out = {"time_per_step": t_per_step, "l2_rel_err": l2, "mll": mll,
           "fit_iterations": int(data["iterations"])}
    if cv_holdout:
        # held-out validation of the FITTED hyperparameters using training
        # data only: a nested half-size model (the first n/2 points of the
        # same sequence) predicts the second half.  MLL and GCV are both
        # near-FLAT across optima with very different test error on some
        # cells (measured: ackley_d1 DSI spans l2 0.024-0.34 across inits
        # within 0.07 MLL and 0.2% GCV), so init selection must use a
        # predictive criterion.
        raw = gp._raw_dict()
        gph = make_gp(model_name, d, num_tasks, derivs, seed, init=init)
        if use_grad:
            tasks = list(range(d + 1))
            gph.get_x_next([n // 2] * (d + 1), tasks)
            gph.add_y_next([ys[t][:n // 2] for t in range(d + 1)], tasks)
            x_held = np.asarray(xs[0])[n // 2:]
            y_held = np.asarray(ys[0])[n // 2:]
        else:
            gph.get_x_next(n // 2)
            gph.add_y_next(y_full[:n // 2])
            x_held = np.asarray(x_full)[n // 2:]
            y_held = np.asarray(y_full)[n // 2:]
        gph._set_raw(raw)   # score the FITTED hyperparameters
        pmh = np.asarray(gph.post_mean(x_held, task=0) if use_grad
                         else gph.post_mean(x_held))
        out["cv_err"] = float(np.linalg.norm(y_held - pmh)
                              / (np.linalg.norm(y_held) + 1e-30))
    return out


# hyperparameter-init grid for multi-restart fitting: (lengthscales, scale)
INIT_GRID = [(1.0, 1.0), (0.2, 10.0), (5.0, 1.0)]


def run_best_of(model_name, fname, f, d, n, iterations, use_grad, restarts):
    """Multi-restart fitting (round-4 VERDICT #3): refit from `restarts`
    hyperparameter inits on the SAME data/draw and keep the restart with
    the best held-out CV error (run_one's nested-half validation —
    computed from training data only).  MLL/GCV selection is NOT used:
    both are measured near-flat across optima whose test error differs
    14x on the losing cells.  restarts=1 reproduces the reference's
    single-fit protocol."""
    best = None
    for k in range(min(restarts, len(INIT_GRID))):
        r = run_one(model_name, fname, f, d, n, iterations, use_grad,
                    seed=7, init=INIT_GRID[k], cv_holdout=restarts > 1)
        r["init"] = list(INIT_GRID[k])
        crit = r.get("cv_err", -r["mll"])
        if best is None or crit < best_crit:
            best, best_crit = r, crit
    best["restarts"] = restarts
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 10)
    ap.add_argument("--iterations", type=int, default=5000,
                    help="max fit iterations (reference default: 5000 + early stop)")
    ap.add_argument("--grad", action="store_true", help="also run derivative-informed variants")
    ap.add_argument("--models", default="lattice,dnb2,standard")
    ap.add_argument("--funcs", default=None, help="comma-separated subset of test functions")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu) before any backend init")
    ap.add_argument("--out", default=None, help="write the results dict to this JSON file")
    ap.add_argument("--restarts", type=int, default=1,
                    help="best-of-k randomization draws selected by MLL")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    results = {}
    funcs = {k: v for k, v in SUITE.items()
             if args.funcs is None or k in args.funcs.split(",")}
    for fname, (f, d) in funcs.items():
        for model in args.models.split(","):
            if model == "standard" and args.n > (1 << 12):
                continue
            for use_grad in ([False, True] if args.grad else [False]):
                key = f"{fname}/{model}" + ("/grad" if use_grad else "")
                try:
                    r = run_best_of(model, fname, f, d, args.n,
                                    args.iterations, use_grad, args.restarts)
                except Exception as e:  # keep the sweep going
                    r = {"error": str(e)[:100]}
                results[key] = r
                print(key, json.dumps(r), flush=True)
    print(json.dumps(results, indent=1))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
