r"""Matmul-factorized FFT for the TPU MXU.

XLA's TPU FFT runs far below the hardware's limits at this workload's
shapes (measured n = 2^20 f32: 178 us single row, 0.25 ms/row at batch 59 —
batch-insensitive; PERF_ANALYSIS.md section 4).  This module evaluates the
DFT by mixed-radix Cooley-Tukey with ALL butterflies expressed as <=128-wide
DFT-matrix contractions (einsums), so the work lands on the MXU and layout
changes fold into the matmul operand orders instead of materialized
transposes.  Measured: 96 us single row at n = 2^20 (1.9x), ~1.15x batched.

Math (one level, n = n1 * n2, j = j1 + n1 j2, k = k2 + n2 k1):

    X[k2 + n2 k1] = sum_{j1} w_n^{j1 k2} F_{n1}[j1, k1]
                      (sum_{j2} F_{n2}[k2, j2] x[j1 + n1 j2])

The inner length-n2 DFT recurses along axis -2 with the j1 axis riding as a
trailing batch; factors are capped at 128 (one MXU tile).  The twiddle
tables are host-precomputed complex constants.

The inverse uses conj(fft(conj(x)))/n, matching ``jnp.fft.ifft``.  Both are
linear, so JAX reverse-mode differentiates through the einsums at the same
cost — no custom VJP needed.

Accuracy: exact to rounding in complex128 (CPU tests pin vs jnp.fft); at
complex64 the relative error is ~5e-7 at n = 2^20 — the same order as the
backend FFT's own f32 error and below the solver's dtype-relative
eigenvalue floor (linalg/fast_solver.effective_lams).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .bitops import log2_int

_LEAF = 128           # split factor (one MXU tile)
_LEAF_MAX = 256       # largest direct DFT-matrix leaf: avoids degenerate
                      # tiny trailing factors (2^22 = 128*128*256, not
                      # 128*128*128*2 — a size-2 einsum level costs two
                      # extra full passes)
_MIN_M_DISPATCH = 14  # below this the backend FFT is already cheap


@functools.lru_cache(maxsize=None)
def _dft_np(n: int) -> np.ndarray:
    j = np.arange(n)
    return np.exp(-2j * np.pi * np.outer(j, j) / n)


@functools.lru_cache(maxsize=None)
def _tw_np(rows: int, cols: int, n: int) -> np.ndarray:
    r = np.arange(rows)[:, None]
    c = np.arange(cols)[None, :]
    return np.exp(-2j * np.pi * r * c / n)


def _fft_axis2(B, L: int):
    """DFT of length L along axis -2 of (..., L, T), unnormalized."""
    dt = B.dtype
    if L <= _LEAF_MAX:
        return jnp.einsum("kl,...lt->...kt", jnp.asarray(_dft_np(L), dt), B)
    l1 = _LEAF
    l2 = L // l1
    T = B.shape[-1]
    B3 = B.reshape(B.shape[:-2] + (l2, l1 * T))
    C = _fft_axis2(B3, l2).reshape(B.shape[:-2] + (l2, l1, T))
    C = C * jnp.asarray(_tw_np(l2, l1, L), dt)[:, :, None]
    E = jnp.einsum("...kjt,jc->...ckt", C, jnp.asarray(_dft_np(l1), dt))
    return E.reshape(B.shape[:-2] + (L, T))


@jax.jit
def fft_mxu(x):
    """Unnormalized forward DFT along the last axis (== jnp.fft.fft).

    ``x`` may be real or complex; n must be a power of two.  Jitted at the
    definition: called eagerly (e.g. the cubature path's host-side solver
    build), the DFT/twiddle tables embed as program constants — an eager
    device_put of a complex numpy constant is UNIMPLEMENTED on the relay
    TPU backend; under an outer jit the wrapper inlines.
    """
    n = x.shape[-1]
    if not jnp.iscomplexobj(x):
        cdt = jnp.complex128 if x.dtype == jnp.float64 else jnp.complex64
        x = x.astype(cdt)
    if n <= _LEAF_MAX:
        return jnp.einsum("...j,jk->...k", x, jnp.asarray(_dft_np(n), x.dtype))
    n1 = _LEAF
    n2 = n // n1
    B = x.reshape(x.shape[:-1] + (n2, n1))
    C = _fft_axis2(B, n2)
    C = C * jnp.asarray(_tw_np(n2, n1, n), x.dtype)
    E = jnp.einsum("...kj,jc->...ck", C, jnp.asarray(_dft_np(n1), x.dtype))
    return E.reshape(x.shape[:-1] + (n,))


@jax.jit
def ifft_mxu(x):
    """Unnormalized-inverse DFT (== jnp.fft.ifft, including the 1/n)."""
    n = x.shape[-1]
    if not jnp.iscomplexobj(x):
        cdt = jnp.complex128 if x.dtype == jnp.float64 else jnp.complex64
        x = x.astype(cdt)
    return jnp.conj(fft_mxu(jnp.conj(x))) * (1.0 / n)


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def fft_best(x):
    """Forward DFT dispatch: MXU factorization on TPU at supported sizes."""
    n = x.shape[-1]
    if _on_tpu() and n == (n & -n) and log2_int(n) >= _MIN_M_DISPATCH \
            and jnp.dtype(x.dtype).itemsize <= 8:
        return fft_mxu(x)
    xc = x if jnp.iscomplexobj(x) else x.astype(
        jnp.complex128 if x.dtype == jnp.float64 else jnp.complex64)
    return jnp.fft.fft(xc)


def ifft_best(x):
    """Inverse DFT dispatch (includes 1/n), mirroring :func:`fft_best`."""
    n = x.shape[-1]
    if _on_tpu() and n == (n & -n) and log2_int(n) >= _MIN_M_DISPATCH \
            and jnp.dtype(x.dtype).itemsize <= 8:
        return ifft_mxu(x)
    return jnp.fft.ifft(x)
