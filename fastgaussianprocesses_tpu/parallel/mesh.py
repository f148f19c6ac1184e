"""Device-mesh utilities and SPMD sharding helpers.

The reference is single-process/single-device (SURVEY.md section 2.4); this
module provides the TPU-native scaling layer: GP-fleet batches, HMC chains,
and long transform axes are laid out over a ``jax.sharding.Mesh`` with
NamedShardings, and XLA GSPMD inserts the ICI collectives.

Axes used by the framework:
* ``batch``  — data parallelism over independently-parameterized GPs
               (shape_batch fleets) and multitask batches;
* ``chains`` — HMC hyperposterior chains;
* ``seq``    — sequence parallelism over the transform axis n (for n beyond
               a single chip's HBM).
"""

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: dict, devices=None) -> Mesh:
    """Create a mesh from {axis_name: size}; -1 means 'all remaining'."""
    if devices is None:
        devices = jax.devices()
    names = list(axis_sizes.keys())
    sizes = list(axis_sizes.values())
    total = len(devices)
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = total // known
    used = int(np.prod(sizes))
    dev_array = np.asarray(devices[:used]).reshape(sizes)
    return Mesh(dev_array, tuple(names))


def batch_sharding(mesh: Mesh, axis: str = "batch") -> NamedSharding:
    """Sharding that splits the leading axis over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_leading(tree, mesh: Mesh, size: int, axis: str = "batch"):
    """Place every leaf whose leading dim equals ``size`` on the mesh axis;
    replicate the rest."""
    bs = batch_sharding(mesh, axis)
    rep = replicated(mesh)

    def place(v):
        if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] == size:
            return jax.device_put(v, bs)
        return jax.device_put(v, rep)

    return jax.tree.map(place, tree)


def make_sharded_fit_step(model, mesh: Mesh, axis: str = "batch",
                          loss_metric: str = "MLL", lr: float = 1e-1):
    """Build a jitted SPMD fit step for a shape_batch GP fleet.

    The fleet's batch axis (y, per-batch hyperparameters, optimizer state)
    shards over ``axis``; point geometry (k1parts) replicates.  Returns
    ``(step, raw, opt_state, data)`` where ``step(raw, opt_state, data) ->
    (loss, raw, opt_state)``.
    """
    import math

    from ..fit.rprop import rprop_init, rprop_update

    assert model.shape_batch, "sharded fit requires a shape_batch fleet"
    B = model.shape_batch[0]
    assert B % mesh.shape[axis] == 0, (
        f"leading batch {B} must divide mesh axis {mesh.shape[axis]}")
    d_out = int(np.prod(model.shape_batch))
    mll_const = d_out * float(model.n.sum()) * math.log(2 * math.pi)
    loss_and_grad = model._make_loss_fn(loss_metric, None, d_out, mll_const, 1)
    trainable = {k: p.trainable for k, p in model.params.items()}

    raw = shard_leading(model._raw_dict(), mesh, B, axis)
    data = shard_leading(model._fit_data(), mesh, B, axis)
    opt_state = shard_leading(rprop_init(model._raw_dict(), lr=lr), mesh, B, axis)

    @jax.jit
    def step(raw, opt_state, data):
        (loss, _), grads = loss_and_grad(raw, data)
        raw, opt_state = rprop_update(grads, opt_state, raw, trainable)
        return loss, raw, opt_state

    return step, raw, opt_state, data


# ---------------------------------------------------------------------------
# sequence-sharded transforms (SP over the n axis)
# ---------------------------------------------------------------------------

def sharded_fwht(x, mesh: Mesh, axis: str = "seq"):
    """Orthonormal FWHT with the last axis sharded over ``axis``.

    Uses the Kronecker split H_n = H_D (x) H_L with D = mesh axis size: the
    local factor runs shard-resident; the cross-shard H_D contraction is a
    small matmul on the sharded dimension for which GSPMD emits the ICI
    collective.  Bitwise-identical to ops.transforms.fwht.
    """
    from ..ops import transforms as tr
    from ..ops.bitops import log2_int

    n = x.shape[-1]
    D = mesh.shape[axis]
    if D == 1 or n < 2 * D:
        return tr.fwht(x)
    dlog = log2_int(D)
    log2_int(n)  # validates power of two
    L = n // D
    xs = jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*([None] * (x.ndim - 1) + [axis]))))
    view = xs.reshape(x.shape[:-1] + (D, L))
    # local factor: FWHT along the within-shard axis
    local = tr.fwht(view)
    # cross-shard factor: H_D contraction over the sharded axis
    h = jnp.asarray(tr._hadamard_np(dlog), dtype=x.dtype) * (1.0 / np.sqrt(D))
    out = jnp.einsum("ij,...jl->...il", h, local)
    out = out.reshape(x.shape)
    return jax.lax.with_sharding_constraint(
        out, NamedSharding(mesh, P(*([None] * (x.ndim - 1) + [axis]))))


def sharded_fftbr(x, mesh: Mesh, axis: str = "seq"):
    """Orthonormal bit-reversed FFT with the last axis sharded over ``axis``.

    Cooley–Tukey split: with the bit-reversal folded into the index map, the
    length-n transform factorizes as per-shard FFTs of length L followed by
    twiddles and a cross-shard DFT of length D (small matmul over the
    sharded axis; GSPMD inserts the collective).
    """
    from ..ops import transforms as tr

    n = x.shape[-1]
    D = mesh.shape[axis]
    if D == 1 or n < 2 * D:
        return tr.fftbr(x)
    L = n // D
    spec = NamedSharding(mesh, P(*([None] * (x.ndim - 1) + [axis])))
    xs = jax.lax.with_sharding_constraint(x, spec)
    # Derivation: with i = c*L + l, the m-bit reversal splits as
    # rho_n(i) = rho_L(l)*D + rho_D(c), so
    #   fftbr(v)[j*L + r] = (1/sqrt(D)) sum_c W[j,c] * TW[c,r] * fftbr_L(v_c)[r]
    # with TW[c,r] = exp(-2 pi i rho_D(c) r / n) and
    #      W[j,c]  = exp(-2 pi i j rho_D(c) / D).
    from ..ops.bitops import bit_reverse_permutation, log2_int as _l2

    dlog = _l2(D)
    rho_d = jnp.asarray(bit_reverse_permutation(dlog).astype(np.int32))
    view = xs.reshape(x.shape[:-1] + (D, L))
    inner = tr.fftbr(view)  # per-shard length-L bit-reversed FFT
    r = jnp.arange(L)
    j = jnp.arange(D)
    tw = jnp.exp(-2j * jnp.pi * (rho_d[:, None] * r[None, :]) / n).astype(inner.dtype)
    inner = inner * tw
    w = jnp.exp(-2j * jnp.pi * (j[:, None] * rho_d[None, :]) / D).astype(inner.dtype)
    outer = jnp.einsum("ij,...jl->...il", w, inner) * (1.0 / np.sqrt(D))
    # output frequency k_global = j * L + r lives at block j
    out = outer.reshape(x.shape)
    return jax.lax.with_sharding_constraint(out, spec)


def sharded_ifftbr(x, mesh: Mesh, axis: str = "seq"):
    """Inverse of :func:`sharded_fftbr` (same sharded layout in and out).

    Runs the forward factorization backwards: cross-shard inverse DFT
    (conjugate-transposed ``W`` matmul over the sharded axis), conjugate
    twiddles, then per-shard length-L inverse bit-reversed FFTs.
    """
    from ..ops import transforms as tr
    from ..ops.bitops import bit_reverse_permutation, log2_int as _l2

    n = x.shape[-1]
    D = mesh.shape[axis]
    if D == 1 or n < 2 * D:
        return tr.ifftbr(x)
    L = n // D
    spec = NamedSharding(mesh, P(*([None] * (x.ndim - 1) + [axis])))
    xs = jax.lax.with_sharding_constraint(x, spec)
    dlog = _l2(D)
    rho_d = jnp.asarray(bit_reverse_permutation(dlog).astype(np.int32))
    view = xs.reshape(x.shape[:-1] + (D, L))
    r = jnp.arange(L)
    j = jnp.arange(D)
    w = jnp.exp(-2j * jnp.pi * (j[:, None] * rho_d[None, :]) / D).astype(view.dtype)
    inner = jnp.einsum("ji,...jl->...il", jnp.conj(w), view) * (1.0 / np.sqrt(D))
    tw = jnp.exp(-2j * jnp.pi * (rho_d[:, None] * r[None, :]) / n).astype(inner.dtype)
    inner = inner * jnp.conj(tw)
    out = tr.ifftbr(inner).reshape(x.shape)
    return jax.lax.with_sharding_constraint(out, spec)


def seq_sharding_for(x_ndim: int, mesh: Mesh, axis: str = "seq") -> NamedSharding:
    """NamedSharding splitting the LAST axis of an ndim-``x_ndim`` array."""
    return NamedSharding(mesh, P(*([None] * (x_ndim - 1) + [axis])))
