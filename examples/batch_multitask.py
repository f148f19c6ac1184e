"""Batched fleets of multitask GPs (reference: docs/examples/batch_multitask)."""

import os
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fastgaussianprocesses_tpu import FastGPLattice


def main(B=3, n=1 << 7, iterations=15):
    d = 2
    gp = FastGPLattice(d, num_tasks=2, seed_for_seq=7, shape_batch=(B,),
                       shape_lengthscales=(B, d), shape_scale=(B, 1))
    xs = gp.get_x_next([n, n // 2], task=[0, 1])
    x0, x1 = np.asarray(xs[0]), np.asarray(xs[1])
    y0 = np.stack([(b + 1) * np.sin(2 * np.pi * x0[:, 0]) for b in range(B)])
    y1 = np.stack([(b + 1) * np.cos(2 * np.pi * x1[:, 1]) for b in range(B)])
    gp.add_y_next([jnp.asarray(y0), jnp.asarray(y1)], task=[0, 1])
    gp.fit(iterations=iterations, verbose=0)
    xq = np.random.default_rng(0).uniform(size=(32, d))
    pm = np.asarray(gp.post_mean(xq))
    print("batch_multitask: post_mean shape", pm.shape,
          "(B, tasks, N) =", (B, 2, 32), "; lengthscales", np.asarray(gp.lengthscales).shape)
    assert pm.shape == (B, 2, 32)
    return True


if __name__ == "__main__":
    main()
