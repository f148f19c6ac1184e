"""Single-task fast GP regression end to end (reference: docs/examples/simple)."""

import os
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fastgaussianprocesses_tpu import FastGPDigitalNetB2, FastGPLattice, StandardGP
from fastgaussianprocesses_tpu.utils.test_functions import ackley


def main(n=1 << 10, d=2, iterations=30):
    for name, cls in [("lattice", FastGPLattice), ("dnb2", FastGPDigitalNetB2),
                      ("standard", StandardGP)]:
        nn = min(n, 1 << 7) if name == "standard" else n
        gp = cls(d, seed_for_seq=7)
        x = gp.get_x_next(nn)
        gp.add_y_next(jnp.asarray(ackley(jnp.asarray(np.asarray(x)))))
        rng = np.random.default_rng(17)
        xq = rng.uniform(size=(128, d))
        yq = np.asarray(ackley(jnp.asarray(xq)))

        def rel():
            pm = np.asarray(gp.post_mean(xq))
            return np.linalg.norm(yq - pm) / np.linalg.norm(yq)

        r0 = rel()
        gp.fit(iterations=iterations, verbose=0)
        r1 = rel()
        pmean, pvar, q, lo, hi = gp.post_ci(xq, confidence=0.99)
        pcm, pcv, q, clo, chi = gp.post_cubature_ci(confidence=0.99)
        print(f"{name:9s} rel err {r0:.4f} -> {r1:.4f}; cubature mean "
              f"{float(pcm):.4f} in [{float(clo):.4f}, {float(chi):.4f}]")
        assert np.isfinite(r1)
    return True


if __name__ == "__main__":
    main()
