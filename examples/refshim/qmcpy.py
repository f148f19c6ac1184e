"""Minimal ``qmcpy`` shim backed by THIS package's generators and torch.

Purpose: run the UNMODIFIED reference library (/root/reference/fastgps,
pure Python + torch) against OUR point sets and special functions, as a
control experiment for accuracy-parity cells (round-3 VERDICT #1/#5): if
the reference code reproduces our numbers on our point sets, a cell gap is
point-set/test-protocol difference, not a behavior difference.

Only the surface the reference actually touches is provided:
Lattice / DigitalNetB2 / Halton (constructed with (d, seed, randomize),
called as seq(n_min=, n_max=, [return_binary=])), fftbr_torch /
ifftbr_torch / fwht_torch, kernel_methods.bernoulli_poly /
weighted_walsh_funcs / shift_invar_ops.BERNOULLIPOLYSDICT, and the
AbstractDiscreteDistribution base.  Diagnostic-only: never imported by the
package itself.
"""

import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from fastgaussianprocesses_tpu.points.digital_net import DigitalNetB2 as _DigitalNetB2
from fastgaussianprocesses_tpu.points.halton import Halton as _Halton
from fastgaussianprocesses_tpu.points.lattice import LatticeSeq as _LatticeSeq


class Lattice(_LatticeSeq):
    def __init__(self, dimension, seed=None, randomize="SHIFT", **kw):
        super().__init__(dimension, seed=seed, randomize=randomize, **kw)


class DigitalNetB2(_DigitalNetB2):
    pass


class Halton(_Halton):
    def gen_samples(self, n):
        return self(0, int(n))


class _AbstractDiscreteDistribution:
    pass


class _DD:  # qp.discrete_distribution namespace
    AbstractDiscreteDistribution = _AbstractDiscreteDistribution


discrete_distribution = _DD


def _bitrev_perm(n):
    m = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint64)
    out = np.zeros(n, dtype=np.int64)
    for b in range(m):
        out |= ((idx >> b) & 1).astype(np.int64) << (m - 1 - b)
    return torch.from_numpy(out)


def fftbr_torch(x):
    n = x.shape[-1]
    perm = _bitrev_perm(n)
    return torch.fft.fft(x[..., perm], norm="ortho")


def ifftbr_torch(x):
    n = x.shape[-1]
    perm = _bitrev_perm(n)
    return torch.fft.ifft(x, norm="ortho")[..., perm]


def fwht_torch(x):
    n = x.shape[-1]
    y = x.clone()
    h = 1
    while h < n:
        y = y.reshape(*y.shape[:-1], n // (2 * h), 2, h)
        a = y[..., 0, :]
        b = y[..., 1, :]
        y = torch.stack([a + b, a - b], dim=-2).reshape(*x.shape[:-1], n)
        h *= 2
    return y / np.sqrt(n)


# --- kernel_methods namespace ------------------------------------------------

_BERNOULLI_COEFFS = {
    1: [1.0, -0.5],
    2: [1.0, -1.0, 1.0 / 6.0],
    3: [1.0, -1.5, 0.5, 0.0],
    4: [1.0, -2.0, 1.0, 0.0, -1.0 / 30.0],
    5: [1.0, -2.5, 5.0 / 3.0, 0.0, -1.0 / 6.0, 0.0],
    6: [1.0, -3.0, 2.5, 0.0, -0.5, 0.0, 1.0 / 42.0],
    7: [1.0, -3.5, 3.5, 0.0, -7.0 / 6.0, 0.0, 1.0 / 6.0, 0.0],
    8: [1.0, -4.0, 14.0 / 3.0, 0.0, -7.0 / 3.0, 0.0, 2.0 / 3.0, 0.0, -1.0 / 30.0],
}


def bernoulli_poly(order, x):
    coeffs = _BERNOULLI_COEFFS[int(order)]
    y = torch.full_like(x, coeffs[0])
    for c in coeffs[1:]:
        y = y * x + c
    return y


def weighted_walsh_funcs(order, delta, t):
    """omega_order(delta) + 1 on int64 tensors (reference call convention)."""
    import jax.numpy as jnp

    from fastgaussianprocesses_tpu.ops.walsh import omega_walsh

    d_np = delta.detach().cpu().numpy()
    om = np.asarray(omega_walsh(jnp.asarray(d_np), int(t), int(order),
                                dtype=jnp.float64))
    return torch.from_numpy(om + 1.0).to(delta.device)


class _ShiftInvarOps:
    BERNOULLIPOLYSDICT = {k: _BERNOULLI_COEFFS[2 * k] for k in (1, 2, 3, 4)}


class _KMUtil:
    shift_invar_ops = _ShiftInvarOps


class _KernelMethods:
    shift_invar_ops = _ShiftInvarOps
    util = _KMUtil
    bernoulli_poly = staticmethod(bernoulli_poly)
    weighted_walsh_funcs = staticmethod(weighted_walsh_funcs)


kernel_methods = _KernelMethods


class IIDStdUniform:
    """Type-annotation placeholder (reference standard_gp.py:127)."""


class DiscreteDistribution(_AbstractDiscreteDistribution):
    """Type-annotation placeholder."""
