"""Fused Pallas FWHT kernel for TPU.

The XLA-level FWHT (ops/transforms.fwht) factorizes H_n into 2-3 Hadamard
contractions; each stage materializes its intermediate in HBM, so the
transform costs several HBM round trips plus transposes.  This kernel keeps
a slab of rows resident in VMEM and applies the whole transform as two 2D
MXU matmuls per row — one HBM read + one write per element.

Math: with n = n1*n2 and a row x viewed as the row-major matrix X of shape
(n1, n2), the Kronecker identity H_n = H_{n1} (x) H_{n2} gives
``fwht(x) = vec(H_{n1} X H_{n2})`` (Hadamard matrices are symmetric).  Both
factors are plain 2D matmuls, which Mosaic compiles natively — the earlier
3D ``dot_general`` formulation was rejected by this backend's Mosaic build.

Sizes: the fused kernel covers 2^14 <= n <= 2^18 (= _M_FUSED_MAX; one row
slab of 4*2^18 f32 = 1 MB fits VMEM, m=19 fails Mosaic VMEM limits).  For n
up to 2^22 a hybrid splits H_n = H_{n/2^18} (x) H_{2^18}: the wide inner
factor runs in Pallas and the small outer factor is a single XLA
contraction — two HBM round trips total vs three-plus for the factorized
XLA path.

The transform is linear and self-adjoint, so its VJP is itself — autodiff
never differentiates through the kernel body.

Reference behavior anchor: qmcpy ``fwht_torch`` used at
/root/reference/fastgps/fast_gp_digital_net_b2.py:226 (the model's hot op).
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bitops import log2_int
from .transforms import _hadamard_np

_M_MIN = 14          # below this the XLA path is already cheap
_M_FUSED_MAX = 18    # one slab of rows fits VMEM (m=19 fails Mosaic VMEM limits)
_M_HYBRID_MAX = 22   # outer Kronecker factor handled by one XLA contraction


def _split(m: int):
    """Balanced two-factor split n = 2^m = n1 * n2 (minimizes n1 + n2)."""
    m1 = (m + 1) // 2
    return 1 << m1, 1 << (m - m1)


def _rows_per_block(m: int) -> int:
    """Row-slab size: keep the in+out+intermediate VMEM footprint ~<= 4 MB
    (m=18 at twice this slab overflowed the 16 MB scoped-vmem limit when the
    kernel ran inside a larger jit graph)."""
    return max(1, min(8, 1 << (18 - m)))


def _make_kernel(rows, n1, scale):
    def kernel(x_ref, h1_ref, h2_ref, o_ref):
        # stage 1: contract the contiguous (lane) factor for the whole slab
        y = jnp.dot(x_ref[...], h2_ref[...], preferred_element_type=x_ref.dtype)
        # stage 2: contract the strided (sublane) factor one row at a time —
        # each row's view is a static 2D slice, so both stages are 2D matmuls
        for r in range(rows):
            o_ref[r * n1:(r + 1) * n1, :] = (
                jnp.dot(h1_ref[...], y[r * n1:(r + 1) * n1, :],
                        preferred_element_type=x_ref.dtype) * scale)

    return kernel


def _fwht_fused(xb, m, scale, interpret):
    """Pallas FWHT of (B, n) rows, n = 2^m with _M_MIN <= m <= _M_FUSED_MAX.

    ``scale`` is folded into the output (pass 1/sqrt(n) for the orthonormal
    transform, or a partial factor from the hybrid caller).
    """
    B, n = xb.shape
    n1, n2 = _split(m)
    rows = _rows_per_block(m)
    pad = (-B) % rows
    if pad:
        xb = jnp.concatenate([xb, jnp.zeros((pad, n), xb.dtype)], 0)
    Bp = xb.shape[0]
    x2d = xb.reshape(Bp * n1, n2)
    h1 = jnp.asarray(_hadamard_np(log2_int(n1)), dtype=xb.dtype)
    h2 = jnp.asarray(_hadamard_np(log2_int(n2)), dtype=xb.dtype)
    kernel = _make_kernel(rows, n1, float(scale))
    # index-map literals must stay int32: under global x64 the `0`s trace as
    # int64 and Mosaic fails to legalize the index function's return
    zero = np.int32(0)
    out = pl.pallas_call(
        kernel,
        grid=(Bp // rows,),
        in_specs=[
            pl.BlockSpec((rows * n1, n2), lambda i: (i, zero), memory_space=pltpu.VMEM),
            pl.BlockSpec((n1, n1), lambda i: (zero, zero), memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n2), lambda i: (zero, zero), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows * n1, n2), lambda i: (i, zero),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp * n1, n2), xb.dtype),
        interpret=interpret,
    )(x2d, h1, h2)
    return out.reshape(Bp, n)[:B]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def fwht_pallas(x, interpret=False):
    """Orthonormal FWHT along the last axis via fused Pallas matmul kernels.

    Args:
        x: (..., n) real float array, n = 2^m with _M_MIN <= m <= _M_HYBRID_MAX.
        interpret: run the Pallas kernel in interpreter mode (CPU testing).
    """
    return _fwht_impl(x, interpret)


def _fwht_impl(x, interpret):
    n = x.shape[-1]
    m = log2_int(n)
    assert _M_MIN <= m <= _M_HYBRID_MAX, (
        f"fwht_pallas supports 2^{_M_MIN}..2^{_M_HYBRID_MAX}, got 2^{m}")
    batch_shape = x.shape[:-1]
    xb = x.reshape((-1, n))
    inv_sqrt_n = 1.0 / math.sqrt(n)
    if m <= _M_FUSED_MAX:
        out = _fwht_fused(xb, m, inv_sqrt_n, interpret)
    else:
        # hybrid: H_n = H_no (x) H_ni with ni = 2^_M_FUSED_MAX; inner factor
        # fused in Pallas (full normalization folded in), outer one XLA matmul
        mi = _M_FUSED_MAX
        ni, no = 1 << mi, 1 << (m - mi)
        B = xb.shape[0]
        inner = _fwht_fused(xb.reshape(B * no, ni), mi, inv_sqrt_n, interpret)
        ho = jnp.asarray(_hadamard_np(m - mi), dtype=x.dtype)
        out = jnp.moveaxis(
            jnp.tensordot(inner.reshape(B, no, ni), ho, axes=[[1], [1]]),
            -1, 1).reshape(B, n)
    return out.reshape(batch_shape + (n,))


def _fwht_fwd(x, interpret):
    return _fwht_impl(x, interpret), None


def _fwht_bwd(interpret, _, g):
    # H is symmetric orthonormal: the VJP of x -> Hx is g -> Hg
    return (_fwht_impl(g, interpret),)


fwht_pallas.defvjp(_fwht_fwd, _fwht_bwd)


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def fwht_best(x):
    """FWHT dispatch: fused Pallas kernel on TPU for f32 at supported sizes,
    XLA contraction path otherwise.  Measured per-(m, B) wall times and
    speedups on the real chip are the committed artifact FWHT_BENCH.json,
    regenerated by examples/bench_fwht.py (scan-chained timing with
    host-fetch sync).  The single-row hybrid (B=1, m > _M_FUSED_MAX) is the
    one measured regression (0.90x at m=22) and routes to XLA."""
    from . import transforms as tr

    n = x.shape[-1]
    m = log2_int(n) if n == (n & -n) else -1
    batch = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
    if (_on_tpu() and x.dtype == jnp.float32 and _M_MIN <= m <= _M_HYBRID_MAX
            and not (batch == 1 and m > _M_FUSED_MAX)):
        return fwht_pallas(x)
    return tr.fwht(x)
