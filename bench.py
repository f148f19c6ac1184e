"""Benchmark: MLL optimization-step throughput, n = 2^20 lattice points.

Measures the full hyperparameter-fit hot path of FastGPLattice — kernel
series contraction, orthonormal bit-reversed FFT, eigen-space MLL, reverse-
mode gradients, Rprop update — as one jitted step on the current accelerator.

Baseline: the reference's probnum25 tables give 5.6e-4 s/step at n=2^10 on
CPU (benchmarks_accuracy_time.tex:6); O(n log n) extrapolation to n=2^20 is
~1 s/step, and BASELINE.json's north star is < 1 s/step on one v5e chip —
so vs_baseline is measured steps/s against a 1 step/s baseline.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from fastgaussianprocesses_tpu import FastGPLattice
    from fastgaussianprocesses_tpu.fit.rprop import rprop_init, rprop_update

    n, d = 1 << 20, 8
    dtype = jnp.float32 if jax.default_backend() != "cpu" else jnp.float64
    fgp = FastGPLattice(d, seed_for_seq=7, dtype=dtype, alpha=2)
    x = fgp.get_x_next_host(n)
    y = np.sin(2 * np.pi * x[:, 0]) * np.cos(2 * np.pi * x[:, 1]) + x.sum(1)
    fgp.add_y_next(np.asarray(y, dtype=dtype))

    mll_const = float(n) * np.log(2 * np.pi)
    loss_and_grad = fgp._make_loss_fn("MLL", None, 1, mll_const, 1)
    data = fgp._fit_data()
    trainable = {k: p.trainable for k, p in fgp.params.items()}

    @jax.jit
    def step(raw, opt_state, data):
        (loss, _), grads = loss_and_grad(raw, data)
        raw, opt_state = rprop_update(grads, opt_state, raw, trainable)
        return loss, raw, opt_state

    raw = fgp._raw_dict()
    opt_state = rprop_init(raw)
    # warmup/compile
    loss, raw, opt_state = step(raw, opt_state, data)
    jax.block_until_ready(loss)
    loss, raw, opt_state = step(raw, opt_state, data)
    jax.block_until_ready(loss)

    iters = 100
    t0 = time.perf_counter()
    for _ in range(iters):
        loss, raw, opt_state = step(raw, opt_state, data)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / iters
    steps_per_s = 1.0 / dt

    assert np.isfinite(float(loss)), "non-finite loss in benchmark"
    print(json.dumps({
        "metric": "MLL steps/s, n=2^20 lattice, d=8, single chip",
        "value": round(steps_per_s, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / 1.0, 3),
    }))


if __name__ == "__main__":
    main()
