"""Dense oracles for validating the O(n log n) fast paths.

Equivalent of the reference's FASTGP_DEBUG cross-checks (util.py:324-352):
assemble the full multitask Gram matrix by brute force and compare solves,
log-determinants and posterior moments.
"""

import numpy as np
import jax.numpy as jnp


def dense_gram(model, n=None):
    """Full (sum n_l) x (sum n_l) multitask Gram incl. noise and task scaling.

    Matches the effective system solved by the fast path: diagonal blocks are
    ``S_ll * (K_ll + nu_l * I)`` (noise added before task scaling,
    util.py:286-298); off-diagonal ``S_l0l1 * K_l0l1``.
    """
    if n is None:
        n = model.n
    n = np.asarray(n, dtype=np.int64)
    S = np.asarray(model.gram_matrix_tasks)
    assert S.ndim == 2, "dense oracle supports unbatched task Gram only"
    noise = float(np.asarray(model.noise).reshape(-1)[0])
    T = model.num_tasks
    blocks = [[None] * T for _ in range(T)]
    kernels = {}
    for l0 in range(T):
        for l1 in range(T):
            xb0 = model.get_xb(l0, n=int(n[l0]))
            xb1 = model.get_xb(l1, n=int(n[l1]))
            kv = np.asarray(model._kernel_explicit(
                xb0[:, None], xb1[None, :],
                model.derivatives[l0], model.derivatives[l1],
                model.derivatives_coeffs[l0], model.derivatives_coeffs[l1],
                model.scale, model.lengthscales))
            kernels[(l0, l1)] = kv
    if model.adaptive_nugget:
        tr00 = np.trace(kernels[(0, 0)])
        nus = [noise * abs(np.trace(kernels[(l, l)]) / tr00) for l in range(T)]
    else:
        nus = [noise] * T
    for l0 in range(T):
        for l1 in range(T):
            kv = kernels[(l0, l1)].copy()
            if l0 == l1:
                kv += nus[l0] * np.eye(int(n[l0]))
            blocks[l0][l1] = S[l0, l1] * kv
    return np.block(blocks)
