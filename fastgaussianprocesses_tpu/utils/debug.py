"""Dense-oracle self-verification (the reference's FASTGP_DEBUG subsystem).

With ``FASTGPS_TPU_DEBUG=1``, every fast solver built by the models is
cross-checked against a brute-force dense Gram assembly: solves,
log-determinants, and the MLL quadratic form must agree to tolerance
(reference behavior: util.py:324-352 under FASTGP_DEBUG).
"""

import numpy as np
import jax.numpy as jnp


def dense_gram(model, n=None):
    """Full multitask Gram incl. noise and task scaling, as solved by the
    fast path: diagonal blocks ``S_ll (K_ll + nu_l I)`` (noise added before
    task scaling, util.py:286-298); off-diagonal ``S_l0l1 K_l0l1``."""
    if n is None:
        n = model.n
    n = np.asarray(n, dtype=np.int64)
    S = np.asarray(model.gram_matrix_tasks)
    assert S.ndim == 2, "dense oracle supports unbatched task Gram only"
    noise = float(np.asarray(model.noise).reshape(-1)[0])
    T = model.num_tasks
    kernels = {}
    for l0 in range(T):
        for l1 in range(T):
            xb0 = model.get_xb(l0, n=int(n[l0]))
            xb1 = model.get_xb(l1, n=int(n[l1]))
            kernels[(l0, l1)] = np.asarray(model._kernel_explicit(
                xb0[:, None], xb1[None, :],
                model.derivatives[l0], model.derivatives[l1],
                model.derivatives_coeffs[l0], model.derivatives_coeffs[l1],
                model.scale, model.lengthscales))
    if model.adaptive_nugget:
        tr00 = np.trace(kernels[(0, 0)])
        nus = [noise * abs(np.trace(kernels[(l, l)]) / tr00) for l in range(T)]
    else:
        nus = [noise] * T
    blocks = [[None] * T for _ in range(T)]
    for l0 in range(T):
        for l1 in range(T):
            kv = kernels[(l0, l1)].copy()
            if l0 == l1:
                kv += nus[l0] * np.eye(int(n[l0]))
            blocks[l0][l1] = S[l0, l1] * kv
    return np.block(blocks)


def check_fast_solver(model, solver, rtol=1e-4, atol=1e-6):
    """Assert the frequency-domain solver agrees with the dense oracle."""
    if np.asarray(model.gram_matrix_tasks).ndim != 2:
        return  # batched task Gram: oracle not implemented
    K = dense_gram(model, solver.n)
    ntot = int(solver.n.sum())
    rng = np.random.default_rng(0)
    v = rng.normal(size=ntot)
    got = np.asarray(solver.gram_matrix_solve(jnp.asarray(v, dtype=model.dtype)))
    want = np.linalg.solve(K, v)
    assert np.allclose(got, want, rtol=rtol, atol=max(atol, rtol * np.abs(want).max())), (
        "FASTGPS_TPU_DEBUG: fast solve disagrees with dense oracle")
    _, logdet = np.linalg.slogdet(K)
    got_ld = float(np.asarray(solver.factor.logdet).reshape(-1)[0])
    assert np.isclose(got_ld, logdet, rtol=1e-3), (
        f"FASTGPS_TPU_DEBUG: logdet {got_ld} vs dense {logdet}")
