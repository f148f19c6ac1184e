"""Series-form fast kernels: shift-invariant (lattice/FFT) and
digitally-shift-invariant (digital net/FWHT).

Both families share the reference's split (util.py:40-62 vs
abstract_fast_gp.py:181-191) between

* ``*_parts_from_delta`` — hyperparameter-INdependent per-dimension series
  terms, cacheable per point set; and
* ``kernel_from_parts`` — the cheap hyperparameter contraction
  ``scale * prod_j(ind_j + lengthscale_j * part_j)`` with derivative
  multi-index coefficient sums, which lives inside the autodiff graph.

Derivative multi-indices ``beta``/``kappa`` follow the reference semantics
(abstract_fast_gp.py:173-196): ``beta0`` rows differentiate the first
argument, ``beta1`` rows the second, and ``c0``/``c1`` are their
coefficients.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.bernoulli import bernoulli_poly
from ..ops.walsh_closed import omega_walsh_closed


# ---------------------------------------------------------------------------
# shift-invariant (lattice) kernel
# ---------------------------------------------------------------------------

def si_parts_from_delta(delta, alpha: np.ndarray, beta: np.ndarray, kappa: np.ndarray):
    """Per-dimension SI series terms at lattice differences ``delta``.

    ``coeff_j * B_{2*alpha_j - beta_j - kappa_j}(delta_j)`` with
    ``coeff_j = (-1)^(alpha_j + kappa_j + 1) * (2 pi)^(2 alpha_j) /
    (2 alpha_j - beta_j - kappa_j)!`` — reference behavior:
    fast_gp_lattice.py:267-273.

    Args:
        delta: (..., d) fractional differences in [0, 1).
        alpha, beta, kappa: static int vectors of length d.

    Returns:
        (..., d) array of series terms.
    """
    alpha = np.asarray(alpha, dtype=np.int64)
    beta = np.asarray(beta, dtype=np.int64)
    kappa = np.asarray(kappa, dtype=np.int64)
    d = delta.shape[-1]
    order = 2 * alpha - beta - kappa
    assert (order >= 2).all(), f"kernel order must be >= 2, got {order}"
    cols = []
    for j in range(d):
        coeff = float((-1.0) ** (alpha[j] + kappa[j] + 1)) * math.exp(
            2 * int(alpha[j]) * math.log(2 * math.pi) - math.lgamma(int(order[j]) + 1)
        )
        cols.append(coeff * bernoulli_poly(int(order[j]), delta[..., j]))
    return jnp.stack(cols, axis=-1)


def si_part_dim(delta_j, alpha_j: int, b: int, k: int):
    """One dimension's SI series term (scalar orders; see si_parts_from_delta)."""
    order = 2 * alpha_j - b - k
    assert order >= 2, order
    coeff = float((-1.0) ** (alpha_j + k + 1)) * math.exp(
        2 * alpha_j * math.log(2 * math.pi) - math.lgamma(order + 1))
    return coeff * bernoulli_poly(order, delta_j)


def lattice_ominus(x, z):
    """Group difference on the torus: ``(x - z) mod 1`` (fast_gp_lattice.py:263)."""
    return (x - z) % 1.0


# ---------------------------------------------------------------------------
# digitally-shift-invariant (digital net) kernel
# ---------------------------------------------------------------------------

def dsi_parts_from_delta(delta_b, t: int, alpha: np.ndarray, beta: np.ndarray, kappa: np.ndarray,
                         dtype=jnp.float64):
    """Per-dimension DSI series terms at binary differences ``delta_b``.

    ``(-2)^(beta_j + kappa_j) * (ind_j + omega_{alpha_j - beta_j - kappa_j}
    (delta_j))`` with ``ind_j = 1{beta_j + kappa_j > 0}`` — reference
    behavior: fast_gp_digital_net_b2.py:289-301 (the order-1 closed form is
    subsumed by :func:`omega_walsh`).

    Args:
        delta_b: (..., d) t-bit integer XOR differences.
        t: static bit precision.
        alpha, beta, kappa: static int vectors of length d.
    """
    alpha = np.asarray(alpha, dtype=np.int64)
    beta = np.asarray(beta, dtype=np.int64)
    kappa = np.asarray(kappa, dtype=np.int64)
    d = delta_b.shape[-1]
    bpk = beta + kappa
    order = alpha - bpk
    assert (order >= 1).all() and (order <= 4).all(), f"DSI order must be in [1,4], got {order}"
    cols = []
    for j in range(d):
        om = omega_walsh_closed(delta_b[..., j], t, int(order[j]), dtype=dtype)
        ind = 1.0 if bpk[j] > 0 else 0.0
        cols.append(float((-2.0) ** bpk[j]) * (ind + om))
    return jnp.stack(cols, axis=-1)


def dsi_part_dim(delta_bj, t: int, alpha_j: int, b: int, k: int, dtype=jnp.float64):
    """One dimension's DSI series term (scalar orders; see dsi_parts_from_delta).

    Uses the closed-form omega (ops/walsh_closed.py): O(alpha + log t) vector
    ops per element instead of the O(t * alpha) transfer recursion — the
    recursion remains the exactness oracle in tests."""
    bpk = b + k
    order = alpha_j - bpk
    assert 1 <= order <= 4, order
    om = omega_walsh_closed(delta_bj, t, order, dtype=dtype)
    ind = 1.0 if bpk > 0 else 0.0
    return float((-2.0) ** bpk) * (ind + om)


def digital_ominus(xb, zb):
    """Group difference in base 2: bitwise XOR (fast_gp_digital_net_b2.py:274)."""
    return xb ^ zb


# ---------------------------------------------------------------------------
# shared assembly
# ---------------------------------------------------------------------------

def kernel_fused(part_dim_fn, x_or_b, z_or_b, ominus, beta0: np.ndarray,
                 beta1: np.ndarray, c0, c1, scale, lengthscales):
    """Kernel values WITHOUT materializing the (..., p0, p1, d) parts tensor.

    The cross-kernel at query time evaluates (N, n) pairs; stacking parts
    over d (as the cacheable-parts path does) would materialize (N, n, d) —
    550 GB at N = 2^14, n = 2^20, d = 8.  This variant accumulates the
    product over dimensions with (..., ) = (N, n)-sized buffers only, which
    XLA fuses into one elementwise kernel per dimension.

    ``part_dim_fn(delta_j, j, b, k)``: the per-dimension series term.
    Same math as kernel_parts + kernel_from_parts (reference
    abstract_fast_gp.py:173-191); oracle-tested equal in tests.
    """
    d = x_or_b.shape[-1]
    p0, p1 = len(beta0), len(beta1)
    c0 = np.asarray(c0, dtype=np.float64)
    c1 = np.asarray(c1, dtype=np.float64)
    ls = lengthscales + jnp.zeros((d,), dtype=scale.dtype)  # (*batch, d)
    # per-dimension deltas computed INSIDE the innermost loop so only ONE
    # (N, n) integer temporary is ever live: even one (N, n, d) tensor is
    # gigabytes at query scale, and elementwise chains spawn several of them
    # before fusion
    def delta_j(j):
        return ominus(x_or_b[..., j:j + 1], z_or_b[..., j:j + 1])[..., 0]

    sp_ndim = max(x_or_b.ndim, z_or_b.ndim) - 1
    total = None
    for i0 in range(p0):
        for i1 in range(p1):
            prod = None
            for j in range(d):
                part = part_dim_fn(delta_j(j), j, int(beta0[i0, j]), int(beta1[i1, j]))
                ind = 1.0 if (beta0[i0, j] + beta1[i1, j]) == 0 else 0.0
                lsj = ls[..., j]
                lsj = lsj.reshape(lsj.shape + (1,) * sp_ndim)
                term = ind + lsj * part
                prod = term if prod is None else prod * term
            w = float(c0[i0] * c1[i1])
            contrib = prod if w == 1.0 else w * prod
            total = contrib if total is None else total + contrib
    scale_r = scale[..., 0].reshape(scale.shape[:-1] + (1,) * sp_ndim)
    return scale_r * total


def kernel_fused_scan(part_dim_fn, x_or_b, z_or_b, ominus, beta0: np.ndarray,
                      beta1: np.ndarray, c0, c1, scale, lengthscales, alpha,
                      part_dim_pair_fn=None):
    """:func:`kernel_fused` with the dimension product under a ``lax.scan``.

    The hand-streamed per-dimension deltas of :func:`kernel_fused` do not
    survive XLA: CSE + horizontal fusion merge the d slice-XORs back into one
    ``(N, n, d)`` integer tensor plus d-wide elementwise temporaries — at
    query scale (N-chunk=16..64, n=2^20, d=8) that was 42 GB of HLO temp
    against 16 GB of HBM (round-2 ``BENCH_MATRIX.json`` OOM record).  A scan
    compiles its body ONCE, so the live set is provably O(N*n) regardless of
    d: the running product carry plus a few body temporaries.

    Dimensions are grouped by their static series signature
    ``(alpha_j, beta0_j, beta1_j)`` (the series order must be a Python int —
    it selects polynomial coefficients); each group scans over its stacked
    per-dimension inputs.  Same math as kernel_parts + kernel_from_parts
    (reference abstract_fast_gp.py:173-191); oracle-tested equal in tests.

    Args:
        alpha: per-dimension smoothness (length-d static int vector) — the
            only model-dependent piece of the group key.
        part_dim_pair_fn: optional ``(xj, zj, j, b, k) -> part`` evaluated on
            the broadcastable SIDES instead of the materialized delta —
            models use it to hoist per-side feature maps (e.g. the digital
            net's XOR-commuting bit spreads) out of the O(pairs) inner work.
    """
    d = x_or_b.shape[-1]
    p0, p1 = len(beta0), len(beta1)
    c0 = np.asarray(c0, dtype=np.float64)
    c1 = np.asarray(c1, dtype=np.float64)
    alpha = np.broadcast_to(np.asarray(alpha, dtype=np.int64), (d,))
    ls = lengthscales + jnp.zeros((d,), dtype=scale.dtype)   # (*batch, d)
    batch = ls.shape[:-1]
    sp = np.broadcast_shapes(x_or_b.shape[:-1], z_or_b.shape[:-1])
    sp_ndim = len(sp)
    xT = jnp.moveaxis(x_or_b, -1, 0)    # (d, ...spatial-x)
    zT = jnp.moveaxis(z_or_b, -1, 0)    # (d, ...spatial-z)
    lsT = jnp.moveaxis(ls, -1, 0)       # (d, *batch)
    dtype = scale.dtype
    total = None
    for i0 in range(p0):
        for i1 in range(p1):
            groups = {}
            for j in range(d):
                key = (int(alpha[j]), int(beta0[i0, j]), int(beta1[i1, j]))
                groups.setdefault(key, []).append(j)
            prod = jnp.ones(batch + sp, dtype)
            for (_, b, k), idx in groups.items():
                ind = 1.0 if (b + k) == 0 else 0.0
                jrep = idx[0]

                def term(xj, zj, lsj, _j=jrep, _b=b, _k=k, _ind=ind):
                    if part_dim_pair_fn is not None:
                        part = part_dim_pair_fn(xj, zj, _j, _b, _k)
                    else:
                        delta = ominus(xj[..., None], zj[..., None])[..., 0]
                        part = part_dim_fn(delta, _j, _b, _k)
                    lsj = lsj.reshape(batch + (1,) * sp_ndim)
                    return _ind + lsj * part

                if len(idx) == 1:
                    prod = prod * term(xT[jrep], zT[jrep], lsT[jrep])
                else:
                    ia = np.asarray(idx)

                    def body(carry, inp, _term=term):
                        xj, zj, lsj = inp
                        return carry * _term(xj, zj, lsj), None

                    # unroll=4: each un-unrolled scan step round-trips the
                    # (chunk, n) carry through HBM — for the cheap lattice
                    # series that traffic DOMINATED the cross-kernel (round-4
                    # measurement); unrolling fuses 4 dims per carry pass.
                    # Full unroll would reopen the horizontal-refusion OOM
                    # (round-2: XLA merged hand-streamed slices into a
                    # (chunk, n, d) stack); the compiled-memory guard test
                    # pins the footprint at this setting.
                    prod, _ = jax.lax.scan(body, prod, (xT[ia], zT[ia], lsT[ia]),
                                           unroll=4)
            w = float(c0[i0] * c1[i1])
            contrib = prod if w == 1.0 else w * prod
            total = contrib if total is None else total + contrib
    scale_r = scale[..., 0].reshape(scale.shape[:-1] + (1,) * sp_ndim)
    return scale_r * total


def kernel_parts(parts_fn, x_or_b, z_or_b, ominus, beta0: np.ndarray, beta1: np.ndarray):
    """Stack series terms over derivative multi-index pairs.

    Returns (..., p0, p1, d) where ``...`` are the broadcast spatial dims of
    ``ominus(x, z)`` — reference behavior: abstract_fast_gp.py:173-180.
    """
    delta = ominus(x_or_b, z_or_b)
    p0, p1 = len(beta0), len(beta1)
    rows = []
    for i0 in range(p0):
        cols = []
        for i1 in range(p1):
            cols.append(parts_fn(delta, beta0[i0], beta1[i1]))
        rows.append(jnp.stack(cols, axis=-2))
    return jnp.stack(rows, axis=-3)


def kernel_from_parts(parts, beta0: np.ndarray, beta1: np.ndarray, c0, c1, scale, lengthscales):
    """Hyperparameter contraction of cached series terms.

    ``sum_{i0,i1} c0[i0] c1[i1] * scale * prod_j (ind_j + lengthscales_j *
    parts[..., i0, i1, j])`` with ``ind_j = 1{beta0_j + beta1_j == 0}`` —
    reference behavior: abstract_fast_gp.py:181-191.

    Args:
        parts: (..., p0, p1, d).
        scale: (*batch, 1); lengthscales: (*batch, d) or (*batch, 1).

    Returns:
        (*batch_broadcast, ...) kernel values (spatial dims of parts minus
        the trailing (p0, p1, d)).
    """
    nd = parts.ndim
    scale_r = scale.reshape(scale.shape + (1,) * (nd - 2))
    ls_r = lengthscales.reshape(lengthscales.shape[:-1] + (1,) * (nd - 1) + lengthscales.shape[-1:])
    ind = jnp.asarray((np.asarray(beta0)[:, None, :] + np.asarray(beta1)[None, :, :]) == 0,
                      dtype=parts.dtype)
    terms = scale_r * jnp.prod(ind + ls_r * parts, axis=-1)
    c0 = jnp.asarray(c0, dtype=parts.dtype)
    c1 = jnp.asarray(c1, dtype=parts.dtype)
    return jnp.sum(jnp.sum(terms * c1, axis=-1) * c0, axis=-1)


def _unbroadcast(x, shape):
    """Sum ``x`` down to a broadcast-compatible ``shape`` (VJP reduction)."""
    while x.ndim > len(shape):
        x = x.sum(0)
    for i, (xs, s) in enumerate(zip(x.shape, shape)):
        if s == 1 and xs != 1:
            x = x.sum(i, keepdims=True)
    return x


@jax.custom_vjp
def _prod_terms_t(parts_t, lengthscales, ind):
    """``prod_j (ind_j + ls_j * parts_t[..., j, :])`` over the dim axis -2.

    Equals ``jnp.prod(ind[..., None] + ls_r * parts_t, axis=-2)`` exactly,
    but with a hand-written VJP: XLA differentiates ``prod`` through
    zero-safe cumulative products whose (d, n) intermediates and (d, n)
    input cotangent round-trip HBM — measured 278 us for the n=2^20 d=8
    contraction fwd+VJP against a ~110 us two-pass traffic floor
    (PERF_ANALYSIS.md section 1).  The custom rule emits the lengthscale
    cotangent DIRECTLY (d partial products via an unrolled prefix/suffix
    ladder, each immediately contracted against the upstream cotangent),
    so nothing of shape (d, n) is ever written back; the zero ``parts_t``
    cotangent is dead code XLA eliminates (parts are parameter-free data).
    The prefix/suffix form is the same zero-safe factorization XLA uses,
    so gradients match the autodiff path to roundoff (pinned by
    tests/test_fast_gp.py::test_kernel_from_parts_t_custom_vjp).
    """
    ls_r = lengthscales[..., None, None, :, None]
    return jnp.prod(ind[..., None] + ls_r * parts_t, axis=-2)


def _prod_terms_t_fwd(parts_t, lengthscales, ind):
    return _prod_terms_t(parts_t, lengthscales, ind), (parts_t, lengthscales, ind)


def _prod_terms_t_bwd(res, g):
    parts_t, ls, ind = res
    d = parts_t.shape[-2]
    aniso = ls.shape[-1] == d

    def f(j):
        lsj = (ls[..., j] if aniso else ls[..., 0])[..., None, None, None]
        return ind[..., j][..., None] + lsj * parts_t[..., j, :]

    fs = [f(j) for j in range(d)]
    pre = [None] * d
    run = None
    for j in range(d):
        pre[j] = run
        run = fs[j] if run is None else run * fs[j]
    suf = [None] * d
    run = None
    for j in range(d - 1, -1, -1):
        suf[j] = run
        run = fs[j] if run is None else fs[j] * run
    cols = []
    for j in range(d):
        if pre[j] is None:
            oth = suf[j]
        elif suf[j] is None:
            oth = pre[j]
        else:
            oth = pre[j] * suf[j]
        cj = g * parts_t[..., j, :] if oth is None else g * parts_t[..., j, :] * oth
        cols.append(cj.sum(axis=(-1, -2, -3)))
    dls = jnp.stack(cols, axis=-1)            # (*broadcast_batch, d)
    if not aniso:
        dls = dls.sum(-1, keepdims=True)
    dls = _unbroadcast(dls, ls.shape).astype(ls.dtype)
    return jnp.zeros_like(parts_t), dls, jnp.zeros_like(ind)


_prod_terms_t.defvjp(_prod_terms_t_fwd, _prod_terms_t_bwd)

# Above this dimension count the unrolled prefix/suffix ladder (3d extra
# elementwise nodes) starts to matter for trace/compile size (the d=31
# M=32 derivative cell is already compile-bound) while the contraction is
# no longer the dominant step cost — keep XLA's native prod VJP there.
_PROD_VJP_MAX_D = 16


def kernel_from_parts_t(parts_t, beta0: np.ndarray, beta1: np.ndarray, c0, c1, scale, lengthscales):
    """:func:`kernel_from_parts` for the TPU-layout parts ``(p0, p1, d, n)``.

    The hot fit loop stores first-column series terms with the long point
    axis n LAST (vector lanes) and the short dimension axis d second-to-last
    (sublanes): ``(n, p0, p1, d)`` wastes 15/16 of the lanes when d < 128 and
    made the contraction the dominant HBM cost of an MLL step at n = 2^20.

    Args:
        parts_t: (p0, p1, d, n).
        scale: (*batch, 1); lengthscales: (*batch, d) or (*batch, 1).

    Returns:
        (*batch_broadcast, n) kernel first-column values.
    """
    ind = jnp.asarray((np.asarray(beta0)[:, None, :] + np.asarray(beta1)[None, :, :]) == 0,
                      dtype=parts_t.dtype)                       # (p0, p1, d)
    if parts_t.shape[-2] <= _PROD_VJP_MAX_D:
        terms = _prod_terms_t(parts_t, lengthscales, ind)        # (*b,p0,p1,n)
    else:
        ls_r = lengthscales[..., None, None, :, None]            # (*b,1,1,d|1,1)
        terms = jnp.prod(ind[..., None] + ls_r * parts_t, axis=-2)
    c0 = jnp.asarray(c0, dtype=parts_t.dtype)
    c1 = jnp.asarray(c1, dtype=parts_t.dtype)
    out = jnp.sum(jnp.sum(terms * c1[:, None], axis=-2) * c0[:, None], axis=-2)
    return scale * out
