"""Transforms: orthonormality, inversion, doubling butterflies, stability wrapper."""

import numpy as np
import pytest

import jax.numpy as jnp

from fastgaussianprocesses_tpu.ops import transforms as tr
from fastgaussianprocesses_tpu.ops.bitops import bit_reverse_permutation


def _dense_fwht(n):
    h = np.array([[1.0]])
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h / np.sqrt(n)


@pytest.mark.parametrize("m", [0, 1, 3, 5, 9, 12])
def test_fwht_matches_dense(m):
    n = 1 << m
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, n))
    got = np.asarray(tr.fwht(jnp.asarray(x)))
    want = x @ _dense_fwht(n).T
    np.testing.assert_allclose(got, want, atol=1e-10)


@pytest.mark.parametrize("m", [1, 4, 10])
def test_fwht_self_inverse(m):
    n = 1 << m
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, n))
    y = tr.fwht(tr.fwht(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-10)


@pytest.mark.parametrize("m", [0, 1, 2, 5, 10])
def test_fftbr_inverse_and_unitarity(m):
    n = 1 << m
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, n)) + 1j * rng.normal(size=(2, n))
    y = tr.fftbr(jnp.asarray(x))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(y), axis=-1), np.linalg.norm(x, axis=-1), atol=1e-10)
    back = tr.ifftbr(y)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-10)


def test_fftbr_definition():
    m, n = 4, 16
    rng = np.random.default_rng(3)
    x = rng.normal(size=n)
    perm = bit_reverse_permutation(m)
    want = np.fft.fft(x[perm], norm="ortho")
    got = np.asarray(tr.fftbr(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_stability_wrapper_equals_plain():
    """Mean-centered wrapper is algebraically identical to the raw transform."""
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 64)) + 100.0
    np.testing.assert_allclose(
        np.asarray(tr.ft_stable_lattice(jnp.asarray(x))),
        np.asarray(tr.fftbr(jnp.asarray(x))),
        atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(tr.ft_stable_fwht(jnp.asarray(x))),
        np.asarray(tr.fwht(jnp.asarray(x))),
        atol=1e-8,
    )


@pytest.mark.parametrize("kind", ["lattice", "fwht"])
def test_doubling_butterfly(kind):
    """merge_doubling(ft(v[:n]), ft(v[n:])) == ft(v[:2n]) (util.py:113-126)."""
    rng = np.random.default_rng(5)
    m = 6
    v = rng.normal(size=(3, 1 << (m + 1)))
    n = 1 << m
    if kind == "lattice":
        ft = tr.fftbr
        omega = tr.get_omega_lattice(m)
    else:
        ft = tr.fwht
        omega = 1.0
    got = tr.merge_doubling(ft(jnp.asarray(v[:, :n])), ft(jnp.asarray(v[:, n:])), omega)
    want = ft(jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-10)


def test_pallas_fwht_matches_xla_paths():
    """Fused + hybrid Pallas FWHT (interpreter mode) vs the XLA contraction
    path, including the linear self-adjoint custom VJP."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from fastgaussianprocesses_tpu.ops.pallas_fwht import fwht_pallas
    from fastgaussianprocesses_tpu.ops.transforms import fwht

    rng = np.random.default_rng(3)
    for m, B in [(14, 1), (15, 3), (18, 1), (19, 2)]:
        x = jnp.asarray(rng.standard_normal((B, 1 << m)), dtype=jnp.float32)
        a = fwht_pallas(x, interpret=True)
        b = fwht(x)
        assert float(jnp.max(jnp.abs(a - b))) < 1e-3 * float(jnp.max(jnp.abs(b)))
    x = jnp.asarray(rng.standard_normal((2, 1 << 14)), dtype=jnp.float32)
    g = jax.grad(lambda v: jnp.sum(fwht_pallas(v, True) ** 2))(x)
    g2 = jax.grad(lambda v: jnp.sum(fwht(v) ** 2))(x)
    assert float(jnp.max(jnp.abs(g - g2))) < 1e-3 * float(jnp.max(jnp.abs(g2)))


def test_fwht_best_dispatch_routing(monkeypatch):
    """fwht_best routing: Pallas on TPU for f32 power-of-two sizes in
    [2^14, 2^22] EXCEPT the single-row hybrid (B=1, m > fused max — the one
    measured regression in FWHT_BENCH.json); XLA otherwise."""
    import jax.numpy as jnp
    import numpy as np
    from fastgaussianprocesses_tpu.ops import pallas_fwht as pf

    taken = []
    monkeypatch.setattr(pf, "_on_tpu", lambda: True)
    monkeypatch.setattr(pf, "fwht_pallas",
                        lambda x: taken.append("pallas") or x)
    from fastgaussianprocesses_tpu.ops import transforms as tr
    monkeypatch.setattr(tr, "fwht", lambda x: taken.append("xla") or x)

    def route(shape, dtype=jnp.float32):
        taken.clear()
        pf.fwht_best(jnp.zeros(shape, dtype))
        return taken[0]

    assert route((8, 1 << 17)) == "pallas"          # fused range, batched
    assert route((1, 1 << 17)) == "pallas"          # fused range, single row
    assert route((8, 1 << 20)) == "pallas"          # hybrid range, batched
    assert route((1 << 20,)) == "xla"               # hybrid single row: the
    assert route((1, 1 << 22)) == "xla"             # measured 0.90x cell
    assert route((8, 1 << 10)) == "xla"             # below _M_MIN
    assert route((8, 1 << 23)) == "xla"             # above hybrid max
    assert route((8, 1 << 17), jnp.float64) == "xla"  # non-f32
    taken.clear()
    pf.fwht_best(jnp.zeros((8, 1000), jnp.float32))  # non power of two
    assert taken[0] == "xla"


@pytest.mark.parametrize("n", [128, 256, 1 << 12, 1 << 14, 1 << 16])
def test_mxu_fft_matches_jnp_fft(n):
    """The matmul-factorized (MXU) FFT equals jnp.fft exactly to f64
    rounding, forward and inverse, real and complex input, batched."""
    from fastgaussianprocesses_tpu.ops.mxu_fft import fft_mxu, ifft_mxu

    rng = np.random.default_rng(3)
    x = rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))
    want = np.fft.fft(x)
    got = np.asarray(fft_mxu(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-8)
    xr = rng.standard_normal((2, n))
    np.testing.assert_allclose(np.asarray(fft_mxu(jnp.asarray(xr))),
                               np.fft.fft(xr), rtol=1e-11, atol=1e-8)
    rt = np.asarray(ifft_mxu(jnp.asarray(want)))
    np.testing.assert_allclose(rt, x, rtol=1e-11, atol=1e-9)


def test_mxu_fft_linear_vjp():
    import jax
    """Reverse-mode through the einsum FFT equals the analytic adjoint
    (the transform is linear: VJP of fft is n * ifft of the conj pattern)."""
    from fastgaussianprocesses_tpu.ops.mxu_fft import fft_mxu

    n = 1 << 10
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal(n))
    w = jnp.asarray(rng.standard_normal(n) + 1j * rng.standard_normal(n))

    def loss(v):
        return jnp.real(jnp.vdot(w, fft_mxu(v)))

    g = np.asarray(jax.grad(loss)(x))
    want = np.real(np.conj(np.fft.fft(np.conj(np.asarray(w)))))
    np.testing.assert_allclose(g, want, rtol=1e-10, atol=1e-9)


def test_mxu_dispatch_full_loss_and_grad_matches_backend_fft(monkeypatch):
    """Force the TPU MXU-FFT dispatch on CPU and check the whole MLL
    loss+grad pipeline (solver, half-spectrum path, VJP through the einsum
    FFT) is identical to the backend-FFT path — the on-chip graph takes
    exactly this route."""
    import jax
    import numpy as np
    from fastgaussianprocesses_tpu import FastGPLattice
    from fastgaussianprocesses_tpu.ops import mxu_fft

    def build():
        gp = FastGPLattice(3, seed_for_seq=7, alpha=2)
        x = gp.get_x_next(1 << 14)  # >= 2^14: inside the dispatch window
        gp.add_y_next(jnp.asarray(np.sin(2 * np.pi * np.asarray(x)[:, 0])))
        return gp

    def run(gp):
        mll_const = float(gp.n.sum()) * np.log(2 * np.pi)
        lag = gp._make_loss_fn("MLL", None, 1, mll_const, 1)
        (loss, _), grads = lag(gp._raw_dict(), gp._fit_data())
        return float(loss), {k: np.asarray(v) for k, v in grads.items()}

    l_ref, g_ref = run(build())
    monkeypatch.setattr(mxu_fft, "_on_tpu", lambda: True)
    l_mxu, g_mxu = run(build())
    np.testing.assert_allclose(l_mxu, l_ref, rtol=1e-8)
    for k in g_ref:
        np.testing.assert_allclose(g_mxu[k], g_ref[k], rtol=1e-6, atol=1e-8,
                                   err_msg=k)
