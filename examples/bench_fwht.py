"""Measure the Pallas FWHT against the XLA contraction path on the TPU chip.

Prints per-(m, B) wall time and effective GB/s (one read + one write of the
array per transform = speed-of-light traffic) and writes the measurements to
FWHT_BENCH.json at the repo root — the committed artifact backing the
dispatch thresholds in ops/pallas_fwht.py.  Run on the real chip:

    PYTHONPATH=/root/repo:/root/.axon_site python examples/bench_fwht.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import os
import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fastgaussianprocesses_tpu.ops.pallas_fwht import fwht_pallas
from fastgaussianprocesses_tpu.ops import transforms as tr


def bench(fn, x, iters=100, reps=5):
    """Time one transform by chaining `iters` applications inside one jit
    (FWHT is self-inverse, so repeated application is numerically stable).
    The chain removes per-call dispatch overhead; fetching the scalar sum to
    the host is the only reliable synchronization on this relay backend
    (block_until_ready returns before execution completes)."""

    @jax.jit
    def chained(v):
        y = jax.lax.scan(lambda c, _: (fn(c), None), v, length=iters)[0]
        return jnp.sum(y)

    float(chained(x))  # warmup/compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chained(x))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    results = {"backend": jax.default_backend(), "cells": {}}
    for m in [14, 17, 18, 20, 22]:
        for B in [1, 8]:
            x = jnp.asarray(rng.standard_normal((B, 1 << m)), dtype=jnp.float32)
            t_xla = bench(tr.fwht, x)
            cell = {"xla_us": round(t_xla * 1e6, 1)}
            try:
                t_pal = bench(lambda v: fwht_pallas(v), x)
            except Exception as e:
                cell["pallas_error"] = f"{type(e).__name__}: {str(e)[:200]}"
                print(f"m={m} B={B}  pallas FAILED: {cell['pallas_error']}")
            else:
                nbytes = 2 * x.size * 4  # one read + one write
                cell.update({"pallas_us": round(t_pal * 1e6, 1),
                             "pallas_gbps": round(nbytes / t_pal / 1e9, 1),
                             "xla_gbps": round(nbytes / t_xla / 1e9, 1),
                             "speedup": round(t_xla / t_pal, 2)})
                print(f"m={m} B={B}  xla {t_xla*1e6:8.1f} us ({nbytes/t_xla/1e9:6.1f} GB/s)"
                      f"  pallas {t_pal*1e6:8.1f} us ({nbytes/t_pal/1e9:6.1f} GB/s)"
                      f"  speedup {t_xla/t_pal:4.2f}x")
            results["cells"][f"m{m}_B{B}"] = cell
    out = os.path.join(os.path.dirname(__file__), "..", "FWHT_BENCH.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", os.path.abspath(out))


if __name__ == "__main__":
    main()
