"""The core fast-GP identity: structured Gram matrices are diagonalized by the
fast transforms, with eigenvalues sqrt(n) * ft(first column).

This is the dense-oracle property the reference checks under FASTGP_DEBUG
(util.py:127-130, 324-334).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fastgaussianprocesses_tpu.kernels import series
from fastgaussianprocesses_tpu.ops import transforms as tr
from fastgaussianprocesses_tpu.points.digital_net import DigitalNetB2
from fastgaussianprocesses_tpu.points.lattice import LatticeSeq


def _si_kernel(x, z, alpha, lengthscales, scale=1.0):
    d = x.shape[-1]
    al = np.full(d, alpha)
    ze = np.zeros((1, d), dtype=np.int64)
    parts = series.kernel_parts(
        lambda delta, b0, b1: series.si_parts_from_delta(delta, al, b0, b1),
        jnp.asarray(x)[:, None, :], jnp.asarray(z)[None, :, :], series.lattice_ominus, ze, ze)
    return series.kernel_from_parts(parts, ze, ze, [1.0], [1.0],
                                    jnp.asarray([scale]), jnp.asarray(lengthscales))


def _dsi_kernel(xb, zb, t, alpha, lengthscales, scale=1.0):
    d = xb.shape[-1]
    al = np.full(d, alpha)
    ze = np.zeros((1, d), dtype=np.int64)
    parts = series.kernel_parts(
        lambda delta, b0, b1: series.dsi_parts_from_delta(delta, t, al, b0, b1),
        jnp.asarray(xb)[:, None, :], jnp.asarray(zb)[None, :, :], series.digital_ominus, ze, ze)
    return series.kernel_from_parts(parts, ze, ze, [1.0], [1.0],
                                    jnp.asarray([scale]), jnp.asarray(lengthscales))


@pytest.mark.parametrize("alpha", [1, 2, 4])
def test_lattice_gram_diagonalized(alpha):
    n, d = 64, 3
    seq = LatticeSeq(d, seed=11)
    x = seq(0, n)
    ls = 0.7 * np.ones(d)
    K = np.asarray(_si_kernel(x, x, alpha, ls))
    k1 = np.asarray(_si_kernel(x, x[:1], alpha, ls))[:, 0]
    lam = np.sqrt(n) * np.asarray(tr.fftbr(jnp.asarray(k1)))
    # K = ifftbr . diag(lam) . fftbr
    rng = np.random.default_rng(0)
    v = rng.normal(size=n)
    want = K @ v
    got = np.asarray(tr.ifftbr(lam * np.asarray(tr.fftbr(jnp.asarray(v))))).real
    np.testing.assert_allclose(got, want, atol=1e-8)
    # eigenvalues are real positive (K is SPD up to tiny noise)
    assert np.abs(lam.imag).max() < 1e-8
    assert lam.real.min() > 0


@pytest.mark.parametrize("alpha", [1, 2, 3])
def test_digital_gram_diagonalized(alpha):
    n, d = 64, 3
    seq = DigitalNetB2(d, seed=13, randomize="DS")
    xb = seq(0, n, return_binary=True).astype(np.int64)
    ls = 0.9 * np.ones(d)
    K = np.asarray(_dsi_kernel(xb, xb, seq.t, alpha, ls))
    k1 = np.asarray(_dsi_kernel(xb, xb[:1], seq.t, alpha, ls))[:, 0]
    lam = np.sqrt(n) * np.asarray(tr.fwht(jnp.asarray(k1)))
    rng = np.random.default_rng(1)
    v = rng.normal(size=n)
    want = K @ v
    got = np.asarray(tr.fwht(lam * np.asarray(tr.fwht(jnp.asarray(v)))))
    np.testing.assert_allclose(got, want, atol=1e-8)
    assert lam.min() > 0


def test_cross_task_gram_diagonalized():
    """Two shifts of the same lattice: cross-Gram is also circulant."""
    n, d = 32, 2
    seq0 = LatticeSeq(d, seed=1)
    seq1 = LatticeSeq(d, seed=2)
    x0, x1 = seq0(0, n), seq1(0, n)
    ls = np.ones(d)
    K01 = np.asarray(_si_kernel(x0, x1, 2, ls))
    k1 = K01[:, 0]
    lam = np.sqrt(n) * np.asarray(tr.fftbr(jnp.asarray(k1)))
    rng = np.random.default_rng(2)
    v = rng.normal(size=n)
    got = np.asarray(tr.ifftbr(lam * np.asarray(tr.fftbr(jnp.asarray(v))))).real
    np.testing.assert_allclose(got, K01 @ v, atol=1e-8)
