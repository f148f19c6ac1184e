"""Derivative-informed fast GPs and batched (shape_batch) GP fleets."""

import numpy as np
import pytest

import jax.numpy as jnp

from fastgaussianprocesses_tpu import FastGPDigitalNetB2, FastGPLattice, StandardGP
from util_oracle import dense_gram


def f_poly(x):
    """Smooth periodic-friendly test function with known gradient."""
    x = np.asarray(x)
    return np.sin(2 * np.pi * x[..., 0]) * np.cos(2 * np.pi * x[..., 1])


def df_dx0(x):
    x = np.asarray(x)
    return 2 * np.pi * np.cos(2 * np.pi * x[..., 0]) * np.cos(2 * np.pi * x[..., 1])


def df_dx1(x):
    x = np.asarray(x)
    return -2 * np.pi * np.sin(2 * np.pi * x[..., 0]) * np.sin(2 * np.pi * x[..., 1])


@pytest.mark.parametrize("model_cls,kw", [
    (FastGPLattice, dict(alpha=2)),
    (FastGPDigitalNetB2, dict(alpha=3)),
])
def test_derivative_informed_fast_gp_matches_dense(model_cls, kw):
    d = 2
    derivs = [np.zeros((1, d), dtype=np.int64),
              np.array([[1, 0]]), np.array([[0, 1]])]
    fgp = model_cls(d, num_tasks=3, seed_for_seq=5, derivatives=derivs,
                    noise=1e-4, **kw)
    ns = [32, 16, 16]
    xs = fgp.get_x_next(ns, task=[0, 1, 2])
    ys = [jnp.asarray(f_poly(xs[0])), jnp.asarray(df_dx0(xs[1])), jnp.asarray(df_dx1(xs[2]))]
    fgp.add_y_next(ys, task=[0, 1, 2])
    # derivative mode pins the task Gram to all-ones
    np.testing.assert_allclose(np.asarray(fgp.gram_matrix_tasks), 1.0)
    K = dense_gram(fgp)
    evals = np.linalg.eigvalsh((K + K.T) / 2)
    assert evals.min() > 0, "derivative-informed Gram must stay PD"
    y = np.concatenate([np.asarray(v) for v in ys])
    np.testing.assert_allclose(np.asarray(fgp.coeffs), np.linalg.solve(K, y), atol=1e-5)
    solver = fgp._solver()
    _, logdet = np.linalg.slogdet(K)
    np.testing.assert_allclose(float(solver.factor.logdet), logdet, rtol=1e-6)
    # posterior mean of f at fresh points against dense
    rng = np.random.default_rng(2)
    x = rng.uniform(size=(6, d))
    got = np.asarray(fgp.post_mean(x, task=0))
    kx = np.concatenate([np.asarray(fgp._kernel_explicit(
        jnp.asarray(x)[:, None, :], fgp.get_xb(l)[None, :, :],
        fgp.derivatives[0], fgp.derivatives[l],
        fgp.derivatives_coeffs[0], fgp.derivatives_coeffs[l],
        fgp.scale, fgp.lengthscales)) for l in range(3)], axis=-1)
    np.testing.assert_allclose(got, kx @ np.linalg.solve(K, y), atol=1e-8)


def test_derivative_informed_improves_gradient_prediction():
    d = 2
    derivs = [np.zeros((1, d), dtype=np.int64), np.array([[1, 0]]), np.array([[0, 1]])]
    n = 64
    fgp = FastGPLattice(d, num_tasks=3, seed_for_seq=9, derivatives=derivs, alpha=2)
    xs = fgp.get_x_next([n, n, n], task=[0, 1, 2])
    fgp.add_y_next([jnp.asarray(f_poly(xs[0])), jnp.asarray(df_dx0(xs[1])),
                    jnp.asarray(df_dx1(xs[2]))], task=[0, 1, 2])
    fgp.fit(iterations=10, verbose=0)
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(50, d))
    pm = np.asarray(fgp.post_mean(x, task=[0, 1, 2]))
    rel_f = np.linalg.norm(pm[0] - f_poly(x)) / np.linalg.norm(f_poly(x))
    rel_g = np.linalg.norm(pm[1] - df_dx0(x)) / np.linalg.norm(df_dx0(x))
    assert rel_f < 0.1, rel_f
    assert rel_g < 0.2, rel_g


@pytest.mark.parametrize("model_cls", [FastGPLattice, FastGPDigitalNetB2])
def test_batched_gp_fleet(model_cls):
    """shape_batch fleets: independently-parameterized GPs over shared points
    (reference abstract_gp.py:73-77, batch_multitask examples)."""
    B, n, d = 3, 128, 2
    fgp = model_cls(d, seed_for_seq=3, shape_batch=(B,),
                    shape_lengthscales=(B, d), shape_scale=(B, 1))
    x = fgp.get_x_next(n)
    xx = np.asarray(x)
    ys = np.stack([f_poly(xx) * (b + 1) for b in range(B)])  # (B, n)
    fgp.add_y_next(jnp.asarray(ys))
    assert np.asarray(fgp.coeffs).shape == (B, n)
    rng = np.random.default_rng(1)
    xq = rng.uniform(size=(10, d))
    pm = np.asarray(fgp.post_mean(xq))
    assert pm.shape == (B, 10)
    # each batch element should predict its own scaled function
    for b in range(B):
        rel = np.linalg.norm(pm[b] - (b + 1) * f_poly(xq)) / np.linalg.norm((b + 1) * f_poly(xq))
        assert rel < 0.45, (b, rel)  # structure test; accuracy is covered elsewhere
    pv = np.asarray(fgp.post_var(xq))
    assert pv.shape == (B, 10) and (pv >= 0).all()
    # batched fit runs and improves
    data = fgp.fit(iterations=10, verbose=0, store_loss_hist=True)
    assert data["loss_hist"][-1] >= data["loss_hist"][0]
    # per-batch lengthscales stay independent
    assert np.asarray(fgp.lengthscales).shape == (B, d)
    # cubature shapes
    pcm = np.asarray(fgp.post_cubature_mean())
    assert pcm.shape == (B,)
    pcv = np.asarray(fgp.post_cubature_var())
    assert pcv.shape == (B,) and (pcv >= 0).all()


def test_batched_standard_gp():
    B, n, d = 2, 32, 2
    sgp = StandardGP(d, seed_for_seq=11, shape_batch=(B,), shape_lengthscales=(B, d))
    x = sgp.get_x_next(n)
    xx = np.asarray(x)
    ys = np.stack([f_poly(xx) + b for b in range(B)])
    sgp.add_y_next(jnp.asarray(ys))
    pm = np.asarray(sgp.post_mean(np.asarray(xx[:5])))
    assert pm.shape == (B, 5)
    data = sgp.fit(iterations=8, verbose=0, store_loss_hist=True)
    assert data["loss_hist"][-1] >= data["loss_hist"][0]
    pcm = np.asarray(sgp.post_cubature_mean())
    assert pcm.shape == (B,)


def test_batched_multitask_combined():
    """Batch x multitask: the full cartesian structure of the reference's
    batch_multitask examples."""
    B, d = 2, 2
    fgp = FastGPLattice(d, num_tasks=2, seed_for_seq=7, shape_batch=(B,),
                        shape_lengthscales=(B, d))
    xs = fgp.get_x_next([32, 16], task=[0, 1])
    y0 = np.stack([f_poly(np.asarray(xs[0]))] * B)
    y1 = np.stack([f_poly(np.asarray(xs[1])) * 0.5] * B)
    fgp.add_y_next([jnp.asarray(y0), jnp.asarray(y1)], task=[0, 1])
    pm = np.asarray(fgp.post_mean(np.asarray(xs[1])[:4]))
    assert pm.shape == (B, 2, 4)
    pv = np.asarray(fgp.post_var(np.asarray(xs[1])[:4]))
    assert pv.shape == (B, 2, 4) and (pv >= 0).all()
    data = fgp.fit(iterations=6, verbose=0, store_loss_hist=True)
    assert data["loss_hist"][-1] >= data["loss_hist"][0]
    pcc = np.asarray(fgp.post_cubature_cov())
    assert pcc.shape == (B, 2, 2)


def test_multidim_shape_batch_fleet_and_masks():
    """shape_batch=(2,3) with per-level parameter shapes and an ndim-2 mask
    (reference abstract_gp.py:73-77 + batch_multitask notebooks)."""
    import math
    B0, B1, n, d = 2, 3, 64, 2
    # per-level parameter shapes: full-batch lengthscales, level-1 scale
    # (suffix-of-shape_batch rule, reference abstract_gp.py:83,96)
    fgp = FastGPLattice(d, seed_for_seq=3, shape_batch=(B0, B1),
                        shape_lengthscales=(B0, B1, d), shape_scale=(B1, 1))
    x = fgp.get_x_next(n)
    xx = np.asarray(x)
    ys = np.stack([np.stack([f_poly(xx) * (1 + i + 2 * j) for j in range(B1)])
                   for i in range(B0)])  # (B0, B1, n)
    fgp.add_y_next(jnp.asarray(ys))
    assert np.asarray(fgp.coeffs).shape == (B0, B1, n)
    assert np.asarray(fgp.lengthscales).shape == (B0, B1, d)
    assert np.asarray(fgp.scale).shape == (B1, 1)
    xq = np.random.default_rng(1).uniform(size=(5, d))
    pm = np.asarray(fgp.post_mean(xq))
    assert pm.shape == (B0, B1, 5)
    for i in range(B0):
        for j in range(B1):
            ref = (1 + i + 2 * j) * f_poly(xq)
            assert np.linalg.norm(pm[i, j] - ref) / np.linalg.norm(ref) < 0.45
    pv = np.asarray(fgp.post_var(xq))
    assert pv.shape == (B0, B1, 5) and (pv >= 0).all()
    # full-fleet fit improves
    data = fgp.fit(iterations=8, verbose=0, store_loss_hist=True)
    assert data["loss_hist"][-1] >= data["loss_hist"][0]
    # masked fit: only fleet entries (0,0) and (1,2) contribute to the loss
    masks = np.array([[0, 0], [1, 2]]).T  # index arrays per batch dim
    data_m = fgp.fit(iterations=4, verbose=0, masks=masks, store_loss_hist=True)
    assert np.isfinite(data_m["loss_hist"]).all()
    # cubature keeps the fleet shape
    assert np.asarray(fgp.post_cubature_mean()).shape == (B0, B1)
    assert np.asarray(fgp.post_cubature_var()).shape == (B0, B1)


@pytest.mark.parametrize("model_cls,kw", [
    (FastGPLattice, dict(alpha=3)),
    (FastGPDigitalNetB2, dict(alpha=4)),
])
def test_weighted_multirow_derivatives_match_dense(model_cls, kw):
    """Tasks observing WEIGHTED SUMS of derivatives: multi-row beta with
    non-unit derivatives_coeffs (reference abstract_gp.py:58-72), checked
    against the dense oracle."""
    d = 2
    # task 0: f; task 1: 2*df/dx0 - 0.5*df/dx1 (a directional derivative)
    derivs = [np.zeros((1, d), dtype=np.int64),
              np.array([[1, 0], [0, 1]], dtype=np.int64)]
    coeffs = [np.array([1.0]), np.array([2.0, -0.5])]
    fgp = model_cls(d, num_tasks=2, seed_for_seq=5, derivatives=derivs,
                    derivatives_coeffs=coeffs, noise=1e-4, **kw)
    ns = [32, 16]
    xs = fgp.get_x_next(ns, task=[0, 1])
    y0 = f_poly(xs[0])
    y1 = 2.0 * df_dx0(xs[1]) - 0.5 * df_dx1(xs[1])
    fgp.add_y_next([jnp.asarray(y0), jnp.asarray(y1)], task=[0, 1])
    K = dense_gram(fgp)
    evals = np.linalg.eigvalsh((K + K.T) / 2)
    assert evals.min() > 0, "weighted-derivative Gram must stay PD"
    y = np.concatenate([np.asarray(y0), np.asarray(y1)])
    np.testing.assert_allclose(np.asarray(fgp.coeffs), np.linalg.solve(K, y),
                               atol=1e-5)
    _, logdet = np.linalg.slogdet(K)
    np.testing.assert_allclose(float(fgp._solver().factor.logdet), logdet, rtol=1e-6)
    # posterior mean of the weighted-derivative task against dense
    rng = np.random.default_rng(4)
    xq = rng.uniform(size=(5, d))
    got = np.asarray(fgp.post_mean(xq, task=1))
    kx = np.concatenate([np.asarray(fgp._kernel_explicit(
        jnp.asarray(xq)[:, None, :], fgp.get_xb(l)[None, :, :],
        fgp.derivatives[1], fgp.derivatives[l],
        fgp.derivatives_coeffs[1], fgp.derivatives_coeffs[l],
        fgp.scale, fgp.lengthscales)) for l in range(2)], axis=-1)
    np.testing.assert_allclose(got, kx @ np.linalg.solve(K, y), atol=1e-7)
    # and the fit runs
    data = fgp.fit(iterations=5, verbose=0, store_loss_hist=True)
    assert np.isfinite(data["loss_hist"]).all()
