"""Orthonormal fast transforms diagonalizing structured Gram matrices.

Two transforms, both acting on the last axis (length n = 2^m):

* ``fftbr`` / ``ifftbr`` — the orthonormal FFT composed with the bit-reversal
  permutation.  With lattice points in natural (van der Corput) order, the
  Gram matrix of a shift-invariant kernel satisfies ``K = ifftbr . diag(sqrt(n)
  * fftbr(k1)) . fftbr`` where ``k1`` is the first Gram column.  (Reference
  behavior: qmcpy ``fftbr_torch``/``ifftbr_torch`` used at
  fast_gp_lattice.py:224-225.)
* ``fwht`` — the orthonormal fast Walsh–Hadamard transform (self-inverse).
  Digital-net Gram matrices of digitally-shift-invariant kernels satisfy
  ``K = fwht . diag(sqrt(n) * fwht(k1)) . fwht``.  (Reference behavior:
  qmcpy ``fwht_torch`` used at fast_gp_digital_net_b2.py:226.)

Numerically-stabilized wrappers ``ft_stable``/``ift_stable`` subtract the mean
before transforming and add ``mean * sqrt(n)`` back into the DC bin, avoiding
catastrophic cancellation for near-constant inputs (reference behavior:
abstract_fast_gp.py:197-228).

The FWHT is evaluated as a sequence of Hadamard-matrix contractions over a
multi-axis reshape (n = prod of factors <= 256), so XLA maps it onto the TPU
MXU instead of a scalar butterfly network.  A fused single-HBM-round-trip
Pallas kernel lives in ops/pallas_fwht.py and is used automatically on TPU
for supported sizes.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .bitops import bit_reverse_permutation, log2_int
from .mxu_fft import fft_best, ifft_best


@functools.lru_cache(maxsize=32)
def _hadamard_np(m: int) -> np.ndarray:
    """Unnormalized +/-1 Hadamard matrix of size 2^m (Sylvester order)."""
    h = np.array([[1.0]])
    for _ in range(m):
        h = np.block([[h, h], [h, -h]])
    return h


def _fwht_factors(m: int) -> list:
    """Split m into factors of at most 8 (Hadamard blocks of size <= 256)."""
    out = []
    while m > 0:
        f = min(m, 8)
        # avoid a tiny trailing factor: prefer balanced splits like 8+7 over 8+8+...
        if 0 < m - f < 3 and f > 4:
            f = (m + 1) // 2
        out.append(f)
        m -= f
    return out


def fwht(x: jax.Array) -> jax.Array:
    """Orthonormal fast Walsh–Hadamard transform along the last axis.

    Implemented as Hadamard-matrix contractions on a multi-axis view of the
    last dimension: with n = n1*n2*...*nk, ``H_n = H_{n1} (x) ... (x) H_{nk}``
    (Kronecker), so each factor is one batched matmul on the MXU.
    """
    n = x.shape[-1]
    if n == 1:
        return x
    m = log2_int(n)
    factors = _fwht_factors(m)
    batch_shape = x.shape[:-1]
    sizes = [1 << f for f in factors]
    y = x.reshape((-1,) + tuple(sizes))
    k = len(sizes)
    for axis, f in enumerate(factors):
        h = jnp.asarray(_hadamard_np(f), dtype=x.dtype)
        y = jnp.moveaxis(jnp.tensordot(y, h, axes=[[axis + 1], [1]]), -1, axis + 1)
    y = y.reshape(batch_shape + (n,))
    return y * jnp.asarray(1.0 / math.sqrt(n), dtype=x.dtype)


def fftbr(x: jax.Array) -> jax.Array:
    """Orthonormal FFT of the bit-reverse-permuted input (last axis).

    ``fftbr(v) = FFT_ortho(v[rho])`` with ``rho`` the bit-reversal involution.
    Natural-order lattice Gram matrices are diagonalized by this transform
    without any explicit data permutation at the call site.
    """
    n = x.shape[-1]
    if n == 1:
        return x.astype(_complex_dtype(x.dtype))
    m = log2_int(n)
    perm = jnp.asarray(bit_reverse_permutation(m).astype(np.int32))
    # explicit complex cast (x64 mode would promote f32 -> c128, which TPUs
    # reject) and explicit 1/sqrt(n) normalization (jnp's norm="ortho" runs
    # an eager int64 reduction restricted TPU backends reject)
    xc = x.astype(_complex_dtype(x.dtype)) if not jnp.iscomplexobj(x) else x
    return fft_best(jnp.take(xc, perm, axis=-1)) * (1.0 / math.sqrt(n))


def ifftbr(x: jax.Array) -> jax.Array:
    """Inverse of :func:`fftbr`: bit-reverse-permuted orthonormal IFFT."""
    n = x.shape[-1]
    if n == 1:
        return x
    m = log2_int(n)
    perm = jnp.asarray(bit_reverse_permutation(m).astype(np.int32))
    # the inverse applies 1/n; rescale by sqrt(n) for the orthonormal form
    return jnp.take(ifft_best(x) * math.sqrt(n), perm, axis=-1)


def _complex_dtype(real_dtype):
    return jnp.complex128 if jnp.dtype(real_dtype) == jnp.float64 else jnp.complex64


def _real_dtype(cdtype):
    return jnp.float64 if jnp.dtype(cdtype) == jnp.complex128 else jnp.float32


def _stabilize(transform, x):
    n = x.shape[-1]
    xmean = jnp.mean(x, axis=-1, keepdims=True)
    y = transform(x - xmean)
    bump = (xmean[..., 0] * jnp.asarray(math.sqrt(n), dtype=xmean.dtype)).astype(y.dtype)
    return y.at[..., 0].add(bump)


def ft_stable_lattice(x: jax.Array) -> jax.Array:
    """Mean-centered ``fftbr`` (reference ``ft`` wrapper, abstract_fast_gp.py:197)."""
    return _stabilize(fftbr, x)


def _fft_plain(x: jax.Array) -> jax.Array:
    """Orthonormal FFT without the bit-reversal gather (for inputs already
    stored in bit-reversed order)."""
    n = x.shape[-1]
    if n == 1:
        return x.astype(_complex_dtype(x.dtype))
    xc = x.astype(_complex_dtype(x.dtype)) if not jnp.iscomplexobj(x) else x
    return fft_best(xc) * (1.0 / math.sqrt(n))


def ft_stable_plain_fft(x: jax.Array) -> jax.Array:
    """Mean-centered orthonormal FFT of pre-permuted input."""
    return _stabilize(_fft_plain, x)


def ift_stable_lattice(x: jax.Array) -> jax.Array:
    """Mean-centered ``ifftbr`` (reference ``ift`` wrapper, abstract_fast_gp.py:213)."""
    return _stabilize(ifftbr, x)


def pfft_stable(x: jax.Array) -> jax.Array:
    """Mean-centered orthonormal Pallas FFT, PERMUTED spectrum order.

    The eigen-space solver contract: same as ``ft_stable_plain_fft`` except
    the spectrum comes back in ``pallas_fft.spectrum_perm`` order (a fixed
    relabeling of frequency bins; the DC bin stays at index 0, so the
    stabilization bump lands in the right place).  Input must already be in
    bit-reversed point order, like the plain-FFT path."""
    from .pallas_fft import pfft  # lazy: avoids circular import

    n = x.shape[-1]
    return _stabilize(lambda v: pfft(v, n) * (1.0 / math.sqrt(n)), x)


def pifft_ortho(z: jax.Array, n: int) -> jax.Array:
    """Orthonormal inverse of :func:`pfft_stable`'s underlying transform;
    output in bit-reversed point order (the same vector space the forward
    consumed)."""
    from .pallas_fft import pifft

    return pifft(z, n) * math.sqrt(n)


def pifft_ortho_real(z: jax.Array, n: int) -> jax.Array:
    """Real part of :func:`pifft_ortho` without materializing the imaginary
    plane.  NOT differentiable (no custom VJP) — query paths only."""
    from .pallas_fft import pifft_real

    return pifft_real(z, n) * np.float32(math.sqrt(n))


def ft_stable_fwht(x: jax.Array) -> jax.Array:
    """Mean-centered orthonormal FWHT (self-inverse).

    Dispatches to the fused Pallas kernel on TPU at supported sizes
    (ops/pallas_fwht.fwht_best), the XLA contraction path otherwise.
    """
    from .pallas_fwht import fwht_best  # lazy: avoids circular import

    return _stabilize(fwht_best, x)


def rfft_stable_plain(x: jax.Array) -> jax.Array:
    """Mean-centered orthonormal rfft of pre-permuted REAL input.

    Returns the half spectrum (n//2 + 1 bins) of ``ft_stable_plain_fft``;
    real inputs make the full spectrum Hermitian, so the half carries
    everything and the FFT costs ~half (measured 193 us vs 373 us at
    n = 2^20 f32 on chip — PERF_ANALYSIS.md section 4)."""
    n = x.shape[-1]
    if n == 1:
        return x.astype(_complex_dtype(x.dtype))
    xmean = jnp.mean(x, axis=-1, keepdims=True)
    y = _rfft_raw(x - xmean) * (1.0 / math.sqrt(n))
    bump = (xmean[..., 0] * jnp.asarray(math.sqrt(n), dtype=xmean.dtype)).astype(y.dtype)
    return y.at[..., 0].add(bump)


def rfft_stable_lattice(x: jax.Array) -> jax.Array:
    """Half-spectrum counterpart of :func:`ft_stable_lattice` (bit-reversal
    permutation folded in; mean-centering commutes with the permutation)."""
    n = x.shape[-1]
    if n == 1:
        return x.astype(_complex_dtype(x.dtype))
    m = log2_int(n)
    perm = jnp.asarray(bit_reverse_permutation(m).astype(np.int32))
    return rfft_stable_plain(jnp.take(x, perm, axis=-1))


def _rfft_raw(x: jax.Array) -> jax.Array:
    """rfft dispatch: on TPU at mxu_fft sizes, the full MXU FFT + half-slice
    beats the backend rfft (96 vs 193 us at n=2^20); elsewhere jnp.fft.rfft."""
    from .mxu_fft import _MIN_M_DISPATCH, _on_tpu, fft_mxu

    n = x.shape[-1]
    # Real-input analog of fft_best's itemsize guard: f64 input (itemsize 8)
    # would make fft_mxu embed complex128 constants, which the restricted
    # TPU backend rejects — only f32 (-> c64) may take the MXU path.
    if (_on_tpu() and n == (n & -n) and log2_int(n) >= _MIN_M_DISPATCH
            and jnp.dtype(x.dtype).itemsize <= 4):
        return fft_mxu(x)[..., :n // 2 + 1]
    return jnp.fft.rfft(x)


def _irfft_raw(x_half: jax.Array, n: int) -> jax.Array:
    """irfft dispatch mirroring :func:`_rfft_raw` (Hermitian reconstruction
    + MXU inverse on TPU at supported sizes)."""
    from .mxu_fft import _MIN_M_DISPATCH, _on_tpu, ifft_mxu

    if (_on_tpu() and n == (n & -n) and log2_int(n) >= _MIN_M_DISPATCH
            and jnp.dtype(x_half.dtype).itemsize <= 8):
        # lax.rev, NOT a negative-stride slice: the strided reversal fuses
        # into the downstream FFT einsums as a per-element gather (measured
        # 15.7 ms vs 160 us for one n=2^20 row on chip)
        mid = jax.lax.rev(jnp.conj(x_half[..., 1:-1]), (x_half.ndim - 1,))
        full = jnp.concatenate([x_half, mid], -1)
        return jnp.real(ifft_mxu(full))
    return jnp.fft.irfft(x_half, n)


def ift_stable_plain(x: jax.Array) -> jax.Array:
    """Orthonormal IFFT WITHOUT the bit-reversal gather: output stays in
    bit-reversed order (= ``ifftbr`` composed with the involution)."""
    n = x.shape[-1]
    if n == 1:
        return x
    return _stabilize(lambda v: ifft_best(v) * math.sqrt(n), x)


def irfft_plain(x_half: jax.Array, n: int) -> jax.Array:
    """Real-space inverse of the orthonormal half-spectrum transform with
    output left in bit-reversed order (no gather)."""
    if n == 1:
        return jnp.real(x_half)
    return _irfft_raw(x_half, n) * math.sqrt(n)


def irfft_br(x_half: jax.Array, n: int) -> jax.Array:
    """Real-space inverse of the orthonormal half-spectrum transform with
    bit-reversed output order — equals ``real(ifftbr(full_spectrum))`` for
    Hermitian full spectra."""
    if n == 1:
        return jnp.real(x_half)
    m = log2_int(n)
    perm = jnp.asarray(bit_reverse_permutation(m).astype(np.int32))
    # the inverse applies 1/n; rescale by sqrt(n) for the orthonormal form
    return jnp.take(_irfft_raw(x_half, n) * math.sqrt(n), perm, axis=-1)


def get_omega_lattice(m: int, dtype=jnp.complex128) -> jax.Array:
    """Twiddles ``exp(-i pi k / 2^m)`` for the lattice doubling butterfly.

    Reference behavior: FastGPLattice.get_omega (fast_gp_lattice.py:261-262).
    """
    k = jnp.arange(1 << m)
    return jnp.exp(jnp.asarray(-1j * math.pi, dtype=dtype) * k / (1 << m))


def merge_doubling(prev: jax.Array, new_half_t: jax.Array, omega) -> jax.Array:
    """One radix-2 decimation-in-time merge used for incremental doubling.

    Given ``prev = ft(v[:n])`` and ``new_half_t = ft(v[n:2n])`` (both length n)
    returns ``ft(v[:2n])`` as ``[prev + w*new, prev - w*new] / sqrt(2)`` where
    ``w`` are the lattice twiddles (or 1 for the FWHT).  Reference behavior:
    util.py:113-126 (eigenvalues) and util.py:173-183 (ytilde).
    """
    wn = new_half_t * omega
    scale = jnp.asarray(1.0 / math.sqrt(2.0), dtype=wn.dtype)
    return jnp.concatenate([prev + wn, prev - wn], axis=-1) * scale
