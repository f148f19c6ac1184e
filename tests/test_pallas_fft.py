"""Pallas permuted-spectrum FFT: kernel correctness (interpret mode on CPU)
and solver-level parity of the _PermSpectrumSolver against the rfft
half-spectrum solver."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fastgaussianprocesses_tpu import FastGPLattice
from fastgaussianprocesses_tpu.ops import pallas_fft as pf


@pytest.mark.parametrize("n", [1 << 14, 1 << 15])
def test_pfft_matches_numpy(n):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, n)).astype(np.float32)
    perm = pf.spectrum_perm(n)
    got = np.asarray(jax.jit(pf.pfft, static_argnums=1)(jnp.asarray(x), n))
    want = np.fft.fft(x.astype(np.float64), axis=-1)[:, perm]
    assert np.abs(got - want).max() / np.abs(want).max() < 3e-6
    back = np.asarray(jax.jit(pf.pifft, static_argnums=1)(jnp.asarray(got), n))
    assert np.abs(back.real - x).max() < 2e-5
    assert np.abs(back.imag).max() < 2e-5
    # complex input
    xc = (rng.standard_normal((2, n))
          + 1j * rng.standard_normal((2, n))).astype(np.complex64)
    gotc = np.asarray(jax.jit(pf.pfft, static_argnums=1)(jnp.asarray(xc), n))
    wantc = np.fft.fft(xc.astype(np.complex128), axis=-1)[:, perm]
    assert np.abs(gotc - wantc).max() / np.abs(wantc).max() < 3e-6


@pytest.mark.parametrize("n", [1 << 14, 1 << 15])
def test_pfft_quad_matches_two_pass(n):
    """Fused quadratic-form kernel == sum(w |pfft_stable|^2) (the
    posterior-variance hot path)."""
    from fastgaussianprocesses_tpu.ops import transforms as tr
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, n)).astype(np.float32) + 2.0)
    w = jnp.asarray((rng.random(n) + 0.1).astype(np.float32))
    want = np.asarray(jnp.sum(w * jnp.abs(tr.pfft_stable(x)) ** 2, -1))
    got = np.asarray(jax.jit(pf.pfft_quad, static_argnums=2)(x, w, n))
    assert np.abs(got - want).max() / np.abs(want).max() < 3e-6


def test_pfft_vjp_matches_jnp_fft():
    n = 1 << 14
    perm = pf.spectrum_perm(n)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    g = jnp.asarray((rng.standard_normal(n)
                     + 1j * rng.standard_normal(n)).astype(np.complex64))
    _, vjp_ref = jax.vjp(lambda v: jnp.fft.fft(v.astype(jnp.complex64)), x)
    (g_ref,) = vjp_ref(g)
    _, vjp_mine = jax.vjp(lambda v: pf.pfft(v, n), x)
    (g_mine,) = vjp_mine(g[perm])
    np.testing.assert_allclose(np.asarray(g_mine), np.asarray(g_ref),
                               rtol=0, atol=2e-4 * float(jnp.abs(g_ref).max()))
    xc = jnp.asarray((rng.standard_normal(n)
                      + 1j * rng.standard_normal(n)).astype(np.complex64))
    _, vjp_ref2 = jax.vjp(jnp.fft.ifft, xc)
    (gi_ref,) = vjp_ref2(g)
    _, vjp_mine2 = jax.vjp(lambda v: pf.pifft(v, n), xc[perm])
    (gi_mine,) = vjp_mine2(g)
    np.testing.assert_allclose(np.asarray(gi_mine)[perm], np.asarray(gi_ref),
                               rtol=0, atol=2e-4 * float(jnp.abs(gi_ref).max()))


def _make_lattice(n, force_perm, monkeypatch, **kw):
    if force_perm:
        monkeypatch.setenv("FASTGPS_TPU_FORCE_PERM", "1")
    else:
        monkeypatch.delenv("FASTGPS_TPU_FORCE_PERM", raising=False)
    gp = FastGPLattice(2, seed_for_seq=11, dtype=jnp.float32, **kw)
    x = np.asarray(gp.get_x_next(n))
    y = np.sin(2 * np.pi * x[:, 0]) * np.cos(2 * np.pi * x[:, 1]) + x.sum(1)
    gp.add_y_next(jnp.asarray(y, dtype=jnp.float32))
    return gp


def test_perm_solver_matches_half_solver(monkeypatch):
    """The permuted-spectrum solver must agree with the half-spectrum
    solver bin-for-bin (same effective eigenvalues, relabeled)."""
    from fastgaussianprocesses_tpu.models.fast import (_HalfSpectrumSolver,
                                                       _PermSpectrumSolver)
    n = 1 << 15
    gp_p = _make_lattice(n, True, monkeypatch)
    s_p = gp_p._solver()
    assert isinstance(s_p, _PermSpectrumSolver)
    norm_p, logdet_p = s_p.norm_logdet_terms()
    coeffs_p = np.asarray(s_p.coeffs())
    dc_p = np.asarray(s_p.dc_block())
    invd_p = np.asarray(s_p.inv_diag())
    gcv_n_p, gcv_d_p = s_p.gcv_terms()

    monkeypatch.delenv("FASTGPS_TPU_FORCE_PERM", raising=False)
    gp_h = _make_lattice(n, False, monkeypatch)
    s_h = gp_h._solver()
    assert isinstance(s_h, _HalfSpectrumSolver)
    norm_h, logdet_h = s_h.norm_logdet_terms()

    np.testing.assert_allclose(np.asarray(norm_p), np.asarray(norm_h),
                               rtol=2e-4)
    np.testing.assert_allclose(np.asarray(logdet_p), np.asarray(logdet_h),
                               rtol=2e-5)
    np.testing.assert_allclose(coeffs_p, np.asarray(s_h.coeffs()),
                               rtol=0, atol=2e-3 * np.abs(coeffs_p).max())
    np.testing.assert_allclose(dc_p, np.asarray(s_h.dc_block()), rtol=2e-4)
    np.testing.assert_allclose(invd_p, np.asarray(s_h.inv_diag()), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(gcv_n_p), np.asarray(s_h.gcv_terms()[0]),
                               rtol=2e-3)
    np.testing.assert_allclose(np.asarray(gcv_d_p), np.asarray(s_h.gcv_terms()[1]),
                               rtol=2e-4)


def test_perm_posterior_matches_half(monkeypatch):
    n = 1 << 15
    xq = np.random.default_rng(5).uniform(size=(16, 2))
    gp_p = _make_lattice(n, True, monkeypatch)
    pm_p, pv_p = gp_p.post_mean_var(xq)
    pcm_p = float(gp_p.post_cubature_mean())
    pcv_p = float(gp_p.post_cubature_var())

    monkeypatch.delenv("FASTGPS_TPU_FORCE_PERM", raising=False)
    gp_h = _make_lattice(n, False, monkeypatch)
    pm_h, pv_h = gp_h.post_mean_var(xq)
    # tolerance calibrated against f64 truth: at n=2^15 with noise=1e-8 the
    # f32 solve itself carries ~0.38 absolute pm error for BOTH paths
    # (perm 0.3827 vs half 0.3841 measured) — the two f32 paths agree to
    # ~4e-3 relative, far inside their common conditioning error
    np.testing.assert_allclose(np.asarray(pm_p), np.asarray(pm_h), rtol=0,
                               atol=4e-3 * float(jnp.abs(pm_h).max()))
    np.testing.assert_allclose(np.asarray(pv_p), np.asarray(pv_h), rtol=0,
                               atol=2e-2 * float(jnp.abs(pv_h).max()) + 1e-8)
    np.testing.assert_allclose(pcm_p, float(gp_h.post_cubature_mean()), rtol=1e-4)
    np.testing.assert_allclose(pcv_p, float(gp_h.post_cubature_var()),
                               rtol=1e-3, atol=1e-12)


def test_perm_loss_and_grad_matches_half(monkeypatch):
    # noise=1.0: this test catches LOGIC bugs (conjugation, scaling, bin
    # mapping) which give O(1) grad differences at any conditioning.  Grad
    # VALUES are compared only by SIGN: the differentiated eigenvalue floor
    # (deliberate — see fast_solver.effective_lams) makes each backend's
    # gradient its own floored surface's gradient, and the floor term's
    # eps-scale contribution differs between the jnp.fft and matmul-DFT
    # error patterns (measured 490 vs 86 on one lengthscale grad at
    # noise=1.0 — both legitimate for their surfaces; exact transform-level
    # VJP parity is pinned by test_pfft_vjp_matches_jnp_fft)
    n = 1 << 15
    gp_p = _make_lattice(n, True, monkeypatch, noise=1.0)

    def loss_fn(gp):
        data = gp._fit_data()

        def f(raw, data):
            solver = gp._solver_pure(raw, data)
            nrm, ld = solver.norm_logdet_terms()
            return 0.5 * (jnp.sum(nrm) + jnp.sum(ld))
        val, grads = jax.jit(jax.value_and_grad(f))(gp._raw_dict(), data)
        return float(val), jax.tree.map(np.asarray, grads)

    v_p, g_p = loss_fn(gp_p)
    monkeypatch.delenv("FASTGPS_TPU_FORCE_PERM", raising=False)
    gp_h = _make_lattice(n, False, monkeypatch, noise=1.0)
    v_h, g_h = loss_fn(gp_h)
    np.testing.assert_allclose(v_p, v_h, rtol=2e-4)
    for k in g_p:
        if g_p[k].size == 0:
            continue
        scale = np.abs(g_h[k]).max() + 1e-9
        big = np.abs(g_h[k]) > 1e-3 * scale
        assert (np.sign(g_p[k][big]) == np.sign(g_h[k][big])).all(), \
            f"grad sign mismatch for {k}: {g_p[k]} vs {g_h[k]}"
