"""Multi-fidelity multitask GP (reference: docs/examples/multitask)."""

import os
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fastgaussianprocesses_tpu import FastGPLattice
from fastgaussianprocesses_tpu.utils.test_functions import ackley


def main(n_hi=1 << 7, iterations=25):
    d = 2
    # three fidelities of Ackley: coarse, medium, exact — unequal sample counts
    fns = [lambda x: ackley(x, a=18.0), lambda x: ackley(x, a=19.5), ackley]
    ns = [4 * n_hi, 2 * n_hi, n_hi]
    gp = FastGPLattice(d, num_tasks=3, seed_for_seq=7)
    xs = gp.get_x_next(ns, task=[0, 1, 2])
    gp.add_y_next([jnp.asarray(f(jnp.asarray(np.asarray(x)))) for f, x in zip(fns, xs)],
                  task=[0, 1, 2])
    gp.fit(iterations=iterations, verbose=0)
    rng = np.random.default_rng(5)
    xq = rng.uniform(size=(256, d))
    yq = np.asarray(ackley(jnp.asarray(xq)))
    pm = np.asarray(gp.post_mean(xq, task=2))
    rel = np.linalg.norm(yq - pm) / np.linalg.norm(yq)
    pcov = np.asarray(gp.post_cubature_cov())
    print(f"multitask: high-fidelity rel err {rel:.4f} with n={n_hi} exact samples; "
          f"task cubature cov diag {np.diag(pcov).round(6)}")
    assert rel < 0.5
    return True


if __name__ == "__main__":
    main()
