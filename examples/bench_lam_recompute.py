"""Quantify the cost of recomputing lam (first-column eigenvalues) inside
jitted solves, vs the reference's incremental `_LamCaches` butterfly
(reference util.py:113-132).

This repo's documented deviation (CLAUDE.md): lam is recomputed inside every
jitted solve instead of being maintained by a host-side doubling butterfly.
During `fit` that is forced (params change every step; the reference also
recomputes then).  The deviation only costs anything on UNCHANGED-param
solves — posterior queries after `add_y_next` doubling — where the
reference merges the cached half-size transform in O(n).

Measured here on the real chip, writes LAM_RECOMPUTE.json:

* ``factor_build_s`` — one full lam + factorization build (kernel series
  contraction + first-column transform) as its own jitted fn, scan-chained;
* ``post_mean_query_s`` — a full posterior-mean query at N=2^14 points
  (which embeds exactly one factor build);
* ``fraction`` — factor build as a share of the query it rides in.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python examples/bench_lam_recompute.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from bench import make_lattice

    n, d = 1 << 20, 8
    gp = make_lattice(n, d)
    raw = gp._raw_dict()
    gp._warm_for_fit()

    iters = 20

    @jax.jit
    def build_factor_chain(raw):
        # scan-chain `iters` independent factor builds; perturbing raw by the
        # loop index defeats CSE, matching query-time behavior (fresh build
        # per executable call)
        def body(c, i):
            r = {k: v + 1e-12 * i for k, v in raw.items()}
            s = gp._query_solver_any(r, gp.n)
            return c + jnp.real(s.factor.logdet).sum(), None
        out, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(iters, dtype=gp.dtype))
        return out

    float(build_factor_chain(raw))  # compile + sync (host fetch)
    best_build = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(build_factor_chain(raw))
        best_build = min(best_build, (time.perf_counter() - t0) / iters)

    xq = np.random.default_rng(5).random((1 << 14, d))
    np.asarray(gp.post_mean(xq))  # compile
    best_query = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(gp.post_mean(xq))
        best_query = min(best_query, time.perf_counter() - t0)

    rep = {
        "n": n, "d": d,
        "factor_build_s": round(best_build, 5),
        "post_mean_query_s": round(best_query, 5),
        "fraction": round(best_build / best_query, 4),
        "note": ("factor build = lam recompute + factorization, the work the "
                 "reference's _LamCaches butterfly would partially save on "
                 "unchanged-param solves; fraction is its share of one "
                 "posterior query at N=2^14"),
    }
    out = os.path.join(os.path.dirname(__file__), "..", "LAM_RECOMPUTE.json")
    with open(out, "w") as fh:
        json.dump(rep, fh, indent=1)
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
