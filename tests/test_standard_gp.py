"""StandardGP (dense) model: solves, cubature closed forms, derivative kernels."""

import numpy as np
import pytest

import jax.numpy as jnp

from fastgaussianprocesses_tpu import StandardGP, DigitalNetB2
from util_oracle import dense_gram


def f_sin(x):
    x = np.asarray(x)
    return np.sin(2 * np.pi * x[..., 0]) + np.asarray(x[..., -1])


def _make(n=64, d=2, seed=7, **kw):
    sgp = StandardGP(d, seed_for_seq=seed, **kw)
    x = sgp.get_x_next(n)
    sgp.add_y_next(jnp.asarray(f_sin(x)))
    return sgp


def test_interpolation_and_solve_matches_dense():
    sgp = _make(n=64, noise=1e-6, adaptive_nugget=False)
    K = dense_gram(sgp)
    y = np.asarray(sgp.y)
    np.testing.assert_allclose(np.asarray(sgp.coeffs), np.linalg.solve(K, y), atol=1e-8)
    solver = sgp._solver()
    _, logdet = np.linalg.slogdet(K)
    np.testing.assert_allclose(float(solver.logdet), logdet, rtol=1e-9)
    # near-interpolation (limited by Gaussian-kernel conditioning at this n)
    pm = np.asarray(sgp.post_mean(sgp.x))
    assert np.linalg.norm(pm - y) / np.linalg.norm(y) < 0.05


def test_post_var_matches_dense():
    sgp = _make(n=32, noise=1e-4, adaptive_nugget=False)
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(7, 2))
    K = dense_gram(sgp)
    kx = np.asarray(sgp.kernel(jnp.asarray(x)[:, None, :], np.asarray(sgp.get_x(0))[None, :, :]))
    kxx = np.asarray(sgp.kernel(jnp.asarray(x), jnp.asarray(x)))
    want = kxx - np.einsum("ni,ij,nj->n", kx, np.linalg.inv(K), kx)
    got = np.asarray(sgp.post_var(x))
    np.testing.assert_allclose(got, want, atol=1e-8)


def test_matern_kernels_psd_and_values():
    for kc in ("matern12", "matern32", "matern52"):
        sgp = _make(n=32, kernel_class=kc, noise=1e-4)
        K = dense_gram(sgp)
        evals = np.linalg.eigvalsh(K)
        assert evals.min() > 0
        pm = np.asarray(sgp.post_mean(sgp.x))
        assert np.linalg.norm(pm - np.asarray(sgp.y)) / np.linalg.norm(np.asarray(sgp.y)) < 0.2


def test_gaussian_cubature_closed_forms():
    sgp = _make(n=64, noise=1e-6, adaptive_nugget=False)
    # validate the integrated kernel against quasi-MC integration
    u = DigitalNetB2(2, seed=123)(0, 2**13)
    X = np.asarray(sgp.get_x(0))
    kmat_u = np.asarray(sgp.kernel(jnp.asarray(u)[:, None, :], jnp.asarray(X)[None, :, :]))
    kint_mc = kmat_u.mean(0)
    kint_cf = np.asarray(sgp._kint(sgp.n, np.array([0]))[0])
    np.testing.assert_allclose(kint_cf, kint_mc, atol=5e-5)
    # cubature mean/var vs dense expressions built on the closed-form kint
    K = dense_gram(sgp)
    y = np.asarray(sgp.y)
    np.testing.assert_allclose(float(sgp.post_cubature_mean()),
                               kint_cf @ np.linalg.solve(K, y), rtol=1e-8)
    # the double integral term: MC over pairs
    tterm_mc = np.asarray(sgp.kernel(jnp.asarray(u[:2**12, None, :]),
                                     jnp.asarray(u[None, 2**12:, :]))).mean()
    tterm_cf = float(np.asarray(sgp.scale)[0] * np.asarray(sgp._tprod()))
    np.testing.assert_allclose(tterm_cf, tterm_mc, atol=5e-4)
    want_var = tterm_cf - kint_cf @ np.linalg.solve(K, kint_cf)
    np.testing.assert_allclose(float(sgp.post_cubature_var()), max(want_var, 0), atol=1e-8)


def test_fit_improves():
    sgp = _make(n=64)
    data = sgp.fit(iterations=15, verbose=0, store_loss_hist=True)
    assert data["loss_hist"][-1] >= data["loss_hist"][0]


def test_data_ingestion():
    rng = np.random.default_rng(4)
    x = rng.uniform(size=(40, 3))
    y = f_sin(x)
    sgp = StandardGP(3, data={"x": x, "y": jnp.asarray(y)})
    np.testing.assert_allclose(np.asarray(sgp.x), x)
    pm = np.asarray(sgp.post_mean(x[:5]))
    assert np.linalg.norm(pm - y[:5]) / np.linalg.norm(y[:5]) < 0.1
    with pytest.raises(AssertionError):
        sgp.get_x_next(64)


def test_derivative_kernel_matches_finite_differences():
    sgp = _make(n=8, d=2)
    rng = np.random.default_rng(1)
    x = rng.uniform(0.2, 0.8, size=(3, 2))
    z = rng.uniform(0.2, 0.8, size=(4, 2))
    eps = 1e-5
    b_dx0 = np.array([[1, 0]])
    ze = np.array([[0, 0]])
    got = np.asarray(sgp.kernel(jnp.asarray(x)[:, None, :], jnp.asarray(z)[None, :, :],
                                beta0=b_dx0, beta1=ze))
    xp = x.copy(); xp[:, 0] += eps
    xm = x.copy(); xm[:, 0] -= eps
    kp = np.asarray(sgp.kernel(jnp.asarray(xp)[:, None, :], jnp.asarray(z)[None, :, :]))
    km = np.asarray(sgp.kernel(jnp.asarray(xm)[:, None, :], jnp.asarray(z)[None, :, :]))
    np.testing.assert_allclose(got, (kp - km) / (2 * eps), atol=1e-5)
    # second derivative: d/dx0 d/dz0
    b_dz0 = np.array([[1, 0]])
    got2 = np.asarray(sgp.kernel(jnp.asarray(x)[:, None, :], jnp.asarray(z)[None, :, :],
                                 beta0=b_dx0, beta1=b_dz0))
    zp = z.copy(); zp[:, 0] += eps
    zm = z.copy(); zm[:, 0] -= eps
    kpp = np.asarray(sgp.kernel(jnp.asarray(xp)[:, None, :], jnp.asarray(zp)[None, :, :]))
    kpm = np.asarray(sgp.kernel(jnp.asarray(xp)[:, None, :], jnp.asarray(zm)[None, :, :]))
    kmp = np.asarray(sgp.kernel(jnp.asarray(xm)[:, None, :], jnp.asarray(zp)[None, :, :]))
    kmm = np.asarray(sgp.kernel(jnp.asarray(xm)[:, None, :], jnp.asarray(zm)[None, :, :]))
    fd2 = (kpp - kpm - kmp + kmm) / (4 * eps * eps)
    np.testing.assert_allclose(got2, fd2, atol=1e-4)


def test_nugget_escalation_recovers_spd():
    """Duplicate points make the Gram singular; escalation must recover."""
    x = np.vstack([np.linspace(0.1, 0.9, 8)] * 2).T
    x = np.vstack([x, x])  # exact duplicates
    y = f_sin(x)
    sgp = StandardGP(2, data={"x": x, "y": jnp.asarray(y)}, noise=1e-14,
                     adaptive_nugget=False)
    c = np.asarray(sgp.coeffs)
    assert np.isfinite(c).all()
