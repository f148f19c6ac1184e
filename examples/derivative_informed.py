"""Derivative-informed GPs: function + gradient observations
(reference: docs/examples/derivative_informed)."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fastgaussianprocesses_tpu import FastGPLattice
from fastgaussianprocesses_tpu.utils.test_functions import gradient


def main(n=1 << 6, iterations=20):
    d = 2

    def f(x):
        return jnp.sin(2 * jnp.pi * x[..., 0]) * jnp.cos(2 * jnp.pi * x[..., 1])

    gf = gradient(f)
    derivs = [np.zeros((1, d), dtype=np.int64)] + [e[None, :] for e in np.eye(d, dtype=np.int64)]
    gp = FastGPLattice(d, num_tasks=3, seed_for_seq=9, derivatives=derivs, alpha=2)
    xs = gp.get_x_next([n, n, n], task=[0, 1, 2])
    ys = [jnp.asarray(f(jnp.asarray(np.asarray(xs[0]))))]
    for j in range(d):
        ys.append(jnp.asarray(gf(jnp.asarray(np.asarray(xs[j + 1])))[:, j]))
    gp.add_y_next(ys, task=[0, 1, 2])
    gp.fit(iterations=iterations, verbose=0)
    xq = np.random.default_rng(1).uniform(size=(64, d))
    pm = np.asarray(gp.post_mean(xq, task=[0, 1, 2]))
    yq = np.asarray(f(jnp.asarray(xq)))
    gq = np.asarray(gf(jnp.asarray(xq)))
    rel_f = np.linalg.norm(pm[0] - yq) / np.linalg.norm(yq)
    rel_g = np.linalg.norm(pm[1] - gq[:, 0]) / np.linalg.norm(gq[:, 0])
    print(f"derivative_informed: f rel err {rel_f:.4f}, df/dx0 rel err {rel_g:.4f}")
    assert rel_f < 0.3 and rel_g < 0.5
    return True


if __name__ == "__main__":
    main()
