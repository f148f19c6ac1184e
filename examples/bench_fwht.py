"""Measure the Pallas FWHT against the XLA contraction path on the TPU chip.

Prints per-(m, B) wall time and effective GB/s (one read + one write of the
array per transform = speed-of-light traffic).  Run on the real chip:

    PYTHONPATH=/root/repo:/root/.axon_site python examples/bench_fwht.py
"""

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
    for m in [14, 17, 18, 20]:
        for B in [1, 8]:
            x = jnp.asarray(rng.standard_normal((B, 1 << m)), dtype=jnp.float32)
            t_xla = bench(tr.fwht, x)
            try:
                t_pal = bench(lambda v: fwht_pallas(v), x)
            except Exception as e:
                print(f"m={m} B={B}  pallas FAILED: {type(e).__name__}: {str(e)[:200]}")
                continue
            nbytes = 2 * x.size * 4  # one read + one write
            print(f"m={m} B={B}  xla {t_xla*1e6:8.1f} us ({nbytes/t_xla/1e9:6.1f} GB/s)"
                  f"  pallas {t_pal*1e6:8.1f} us ({nbytes/t_pal/1e9:6.1f} GB/s)"
                  f"  speedup {t_xla/t_pal:4.2f}x")


if __name__ == "__main__":
    main()
