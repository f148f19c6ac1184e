"""Frequency-domain multitask solver for fast GPs.

After the fast transform, the multitask Gram matrix becomes block-sparse in
frequency space: task l (sorted by descending n_l) contributes r_l = n_l /
n_min frequencies per residue class rho in [0, n_min), and frequencies only
couple within a residue class.  The whole (sum n_l)^2 system therefore
factorizes into n_min independent Hermitian M x M systems with
M = sum_l r_l.

This re-derives the reference's recursive Schur-complement inverse
(util.py:269-394) as *batched* small-matrix linear algebra: assemble the
(n_min, M, M) stack once and run one batched Cholesky — MXU-friendly and
free of sequential per-task recursion.  Single-task problems (M == 1)
short-circuit to purely diagonal arithmetic.

Derivation of the coupling rule (cited against reference behavior at
util.py:300-323): for tasks l0 <= l1 (so n0 >= n1), the cross Gram equals
convolution by the first column followed by inclusion of the size-n1
subgroup; in frequency space that is ``diag(sqrt(n0) ft(k1)) * A`` with the
aliasing matrix ``A[k, kappa] = sqrt(n1/n0) * 1{kappa == k mod n1}``, giving
entries ``sqrt(n1) * ft(k1)[k]`` at (k, k mod n1).
"""

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# Coefficient of the dtype-relative eigenvalue floor applied in
# effective_lams (floor = EIG_FLOOR_C * eps * max|lam| added to diagonal
# pairs).  Module-level so experiments can vary it without re-tracing
# call sites; see the long comment in effective_lams before touching it.
EIG_FLOOR_C = 8.0


class FastFactor(NamedTuple):
    """Factorized frequency-space multitask Gram matrix.

    ``lam_eff``: (..., n) effective eigenvalues when T == 1, else None.
    ``inv``: (..., n_min, M, M) batched inverse when T > 1, else None.
    ``logdet``: (...,) real log-determinant of the full system.
    ``n_sorted``: static task sizes, descending.
    ``task_order`` / ``inv_task_order``: static permutations between original
    and sorted task indexing (reference behavior util.py:273-274).
    """

    lam_eff: Optional[jnp.ndarray]
    inv: Optional[jnp.ndarray]
    logdet: jnp.ndarray
    n_sorted: tuple
    task_order: tuple
    inv_task_order: tuple


def sort_tasks(n: Sequence[int]):
    """Descending-n task order and its inverse (stable)."""
    n = np.asarray(n, dtype=np.int64)
    task_order = tuple(int(i) for i in np.argsort(-n, kind="stable"))
    inv_task_order = tuple(int(i) for i in np.argsort(np.asarray(task_order), kind="stable"))
    return task_order, inv_task_order


def effective_lams(lam_pairs: dict, n_sorted, kmat_tasks, noise, task_order,
                   inv_task_order, adaptive_nugget: bool):
    """Apply noise and task-kernel scaling to raw transformed first columns.

    Args:
        lam_pairs: {(l0, l1) sorted positions, l0 <= l1: ft(k1) of length
            n_sorted[l0]} (complex for lattice, real for digital nets).
        kmat_tasks: (..., T, T) task Gram F F^T + diag(v).
        noise: (..., 1).

    Returns:
        {(l0, l1): (..., n_sorted[l0])} with
        ``Lam[l0,l1] = sqrt(n_sorted[l1]) * lam * S[to0, to1]`` and the noise
        (optionally trace-ratio adaptive) added on diagonal pairs before task
        scaling (reference behavior util.py:284-298).
    """
    T = len(n_sorted)
    scaled = {}
    for (l0, l1), lam in lam_pairs.items():
        scaled[(l0, l1)] = jnp.sqrt(jnp.asarray(float(n_sorted[l1]), dtype=jnp.abs(lam).dtype)) * lam
    if adaptive_nugget:
        root = inv_task_order[0]  # sorted position of original task 0
        tr00 = scaled[(root, root)].sum(-1)
        for l in range(T):
            trll = scaled[(l, l)].sum(-1)
            scaled[(l, l)] = scaled[(l, l)] + noise * jnp.abs(trll / tr00)[..., None]
    else:
        for l in range(T):
            scaled[(l, l)] = scaled[(l, l)] + noise
    out = {}
    for (l0, l1), lam in scaled.items():
        s = kmat_tasks[..., task_order[l0], task_order[l1]][..., None]
        out[(l0, l1)] = lam * s
    # dtype-relative eigenvalue floor: the transform computes each lam entry
    # with ABSOLUTE error ~eps * max|lam|, so eigenvalues below that level are
    # numerical noise (possibly negative) and, with near-zero `noise`, the
    # eigen-space solve amplifies them catastrophically.  Flooring diagonal
    # pairs at c*eps*max|lam| makes the solve well-posed in the working
    # precision: invisible in float64 (c*eps ~ 2e-15 relative), and the
    # documented f32 accuracy plateau on TPU (~1e-6 relative nugget).  The
    # reference never faces this because it mandates float64
    # (abstract_gp.py:46); this floor is what makes f32 TPU execution viable.
    # The floor IS differentiated (no stop_gradient): at near-zero `noise`
    # the floored surface's smooth gradient component comes FROM the floor
    # term (8*eps*max|lam| is a smooth function of the hyperparameters,
    # while the "true" floored-bin gradients are f32 cancellation noise).
    # Round 5 tried stop_gradient here to reconcile transform backends
    # whose eps-scale floor gradients differ (+1103 vs +88 on one
    # lengthscale grad) -- and TPU HMC collapsed: without the smooth floor
    # gradient the sampler integrates pure f32 surface noise, acceptance
    # plateaus below any target from Hamiltonian-error noise, and dual
    # averaging drives the step size to zero (bench R-hat 3e4).  Each
    # backend's gradient must be ITS OWN floored surface's gradient.
    for l in range(T):
        lam_ll = out[(l, l)]
        eps = jnp.finfo(jnp.abs(lam_ll).dtype).eps
        floor = EIG_FLOOR_C * eps * jnp.max(jnp.abs(lam_ll), axis=-1,
                                            keepdims=True)
        out[(l, l)] = lam_ll + floor
    return out


def _pair_block(lam, r0: int, r1: int, n_min: int):
    """(..., n_min, r0, r1) coupling block for one sorted task pair."""
    lr = lam.reshape(lam.shape[:-1] + (r0, n_min))
    lr = jnp.swapaxes(lr, -1, -2)  # (..., n_min, r0)
    mask = jnp.asarray(
        (np.arange(r0)[:, None] % r1) == np.arange(r1)[None, :], dtype=lam.dtype)
    return lr[..., :, None] * mask


def _inv_logdet_closed(theta, m: int):
    """Cofactor inverse + log|det| for batched m x m blocks, m <= 3.

    Fully elementwise over the (..., n_min) batch — XLA fuses it into a
    handful of vector ops, where batched ``jnp.linalg.inv`` of tiny blocks
    runs a pivoted LU per matrix (the dominant cost of a multitask MLL step
    at n_min = 2^16: ~127 ms/step before, see BENCH_MATRIX
    lattice_multitask3).  Complex blocks stay in native complex elementwise
    arithmetic (it is complex LU the TPU backend lacks, not complex mul).
    The relative ridge added by the caller bounds the conditioning, making
    the unpivoted closed form safe at these sizes.
    """
    if m == 1:
        a = theta[..., 0, 0]
        det = a
        inv = (1.0 / a)[..., None, None]
    elif m == 2:
        a, b = theta[..., 0, 0], theta[..., 0, 1]
        c, d = theta[..., 1, 0], theta[..., 1, 1]
        det = a * d - b * c
        inv = jnp.stack([jnp.stack([d, -b], -1),
                         jnp.stack([-c, a], -1)], -2) / det[..., None, None]
    else:  # m == 3
        a, b, c = theta[..., 0, 0], theta[..., 0, 1], theta[..., 0, 2]
        d, e, f = theta[..., 1, 0], theta[..., 1, 1], theta[..., 1, 2]
        g, h, i = theta[..., 2, 0], theta[..., 2, 1], theta[..., 2, 2]
        A = e * i - f * h
        B = -(d * i - f * g)
        C = d * h - e * g
        det = a * A + b * B + c * C
        adj = jnp.stack([
            jnp.stack([A, -(b * i - c * h), b * f - c * e], -1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], -1),
            jnp.stack([C, -(a * h - b * g), a * e - b * d], -1)], -2)
        inv = adj / det[..., None, None]
    return inv, jnp.log(jnp.abs(det))


def _bmm(a, b):
    """Batched matmul over tiny trailing block dims.

    ``jnp.einsum("...ij,...jk->...ik")`` on (n_min, m, m) blocks lowers to
    n_min tiny MXU matmuls — measured ~1 ms per einsum at n_min = 2^14,
    m = 4 (several ms of a 12.8 ms derivative-informed step hid here,
    round-4 profiling).  For blocks up to 8x8 the product is unrolled into
    elementwise multiply-adds over the (n_min,) frequency axis: pure fused
    VPU work.  Do NOT replace the small-block unroll with the einsum "to
    save compile time": einsum leaf products inside the jitted Schur
    recursion MISCOMPILE on the CPU backend at odd split sizes (m = 9/17
    inverses off by O(0.5) under jit, exact eagerly — round-5 bisection;
    the unrolled form and the >8 einsum levels are both fine)."""
    mi, mj, mk = a.shape[-2], a.shape[-1], b.shape[-1]
    if max(mi, mj, mk) <= 8:
        rows = [jnp.stack([sum(a[..., i, j] * b[..., j, k] for j in range(mj))
                           for k in range(mk)], -1) for i in range(mi)]
        return jnp.stack(rows, -2)
    return jnp.einsum("...ij,...jk->...ik", a, b)


def _inv_logdet_schur(theta, m: int):
    """Batched inverse + log|det| by recursive 2x2 block Schur complements.

    For m > 3 the closed cofactor form is numerically poor, and batched
    ``jnp.linalg.inv`` runs a per-matrix pivoted LU (the TPU's weak spot for
    tiny blocks; complex needs a 2m x 2m real embedding on top).  Halving
    recursively — ``inv([[A,B],[C,D]])`` via ``S = D - C A^-1 B`` — reduces
    everything to batched SMALL matmuls (einsum over the frequency batch)
    plus the m <= 3 closed forms at the leaves, in native complex
    arithmetic.  This is the batched form of the reference's own unpivoted
    task-recursive Schur inverse (util.py:300-323); the caller's relative
    ridge bounds the conditioning the same way.

    log|det| = log|det A| + log|det S| (valid for invertible A, including
    the indefinite mid-fit systems derivative kernels produce).
    """
    if m <= 3:
        return _inv_logdet_closed(theta, m)
    k = m // 2
    A, B = theta[..., :k, :k], theta[..., :k, k:]
    C, D = theta[..., k:, :k], theta[..., k:, k:]
    invA, logdetA = _inv_logdet_schur(A, k)
    CAi = _bmm(C, invA)
    S = D - _bmm(CAi, B)
    invS, logdetS = _inv_logdet_schur(S, m - k)
    AiB = _bmm(invA, B)
    TR = -_bmm(AiB, invS)
    TL = invA - _bmm(TR, CAi)
    BL = -_bmm(invS, CAi)
    top = jnp.concatenate([TL, TR], -1)
    bot = jnp.concatenate([BL, invS], -1)
    return jnp.concatenate([top, bot], -2), logdetA + logdetS


def factorize(lams: dict, n_sorted, task_order, inv_task_order) -> FastFactor:
    """Factorize the frequency-space system: batched inverse + logdet."""
    T = len(n_sorted)
    if T == 1:
        lam = lams[(0, 0)]
        logdet = jnp.log(jnp.abs(lam)).sum(-1)
        return FastFactor(lam_eff=lam, inv=None, logdet=logdet,
                          n_sorted=tuple(n_sorted), task_order=tuple(task_order),
                          inv_task_order=tuple(inv_task_order))
    n_min = int(n_sorted[-1])
    r = [int(nl) // n_min for nl in n_sorted]
    rows = []
    for l0 in range(T):
        cols = []
        for l1 in range(T):
            if l0 <= l1:
                cols.append(_pair_block(lams[(l0, l1)], r[l0], r[l1], n_min))
            else:
                b = _pair_block(lams[(l1, l0)], r[l1], r[l0], n_min)
                cols.append(jnp.conj(jnp.swapaxes(b, -1, -2)))
        rows.append(jnp.concatenate(cols, axis=-1))
    theta = jnp.concatenate(rows, axis=-2)  # (..., n_min, M, M)
    m = theta.shape[-1]
    # relative ridge on the assembled block system: derivative cross-blocks
    # make near-linearly-dependent rows, and with near-zero `noise` the
    # factorization of the working-precision system loses accuracy.
    # 8*eps*max|diag| is rounding-level regularization, mirroring the
    # single-task eigenvalue floor in effective_lams.
    dmag = jnp.abs(jnp.diagonal(theta, axis1=-2, axis2=-1).real)
    eps = jnp.finfo(dmag.dtype).eps
    ridge = 8.0 * eps * jnp.max(dmag, axis=-1)[..., None]
    theta = theta + ridge[..., None] * jnp.eye(m, dtype=theta.dtype)
    # Indefinite-tolerant factorization (LU inverse + log|det|): derivative-
    # informed kernels are PSD only on part of hyperparameter space (e.g. the
    # DSI (f, df) DC block [[1, -2g], [-2g, 4g]] has det 4g(1-g): indefinite
    # for lengthscale g > 1), and the optimizer legitimately visits such
    # points mid-fit.  The reference's recursive Schur inverse + log|lam|
    # (util.py:299-323) tolerates this; a Cholesky would emit NaNs and kill
    # the fit.  LU matches that semantics batched on the MXU.
    if m <= 64:
        # closed cofactor forms (m <= 3) / recursive block Schur: elementwise
        # + small batched matmuls, ~90x a per-matrix pivoted LU on TPU.
        # Round 5 raised the ceiling 16 -> 64 (reference scales to arbitrary
        # T via the same unpivoted recursion, util.py:300-323): the deeper
        # recursion loses ~1 digit per level vs pivoted LU but the relative
        # ridge bounds conditioning; dense-oracle tests pin M = 32 and the
        # real-embedding LU path remains beyond 64.
        inv, logdet_p = _inv_logdet_schur(theta, m)
        return FastFactor(lam_eff=None, inv=inv, logdet=logdet_p.sum(-1),
                          n_sorted=tuple(n_sorted), task_order=tuple(task_order),
                          inv_task_order=tuple(inv_task_order))
    if jnp.iscomplexobj(theta):
        # Real embedding E(A) = [[Re, -Im], [Im, Re]]: E(A)^-1 = E(A^-1) and
        # det E = |det A|^2.  TPU backends lack complex LU; this stays in
        # native real arithmetic.
        re, im = jnp.real(theta), jnp.imag(theta)
        emb = jnp.concatenate([
            jnp.concatenate([re, -im], -1),
            jnp.concatenate([im, re], -1)], -2)
        _, logabsdet = jnp.linalg.slogdet(emb)
        logdet = 0.5 * logabsdet
        einv = jnp.linalg.inv(emb)
        inv = (einv[..., :m, :m] + 1j * einv[..., m:, :m]).astype(theta.dtype)
    else:
        _, logdet = jnp.linalg.slogdet(theta)
        inv = jnp.linalg.inv(theta)
    logdet = logdet.sum(-1)
    return FastFactor(lam_eff=None, inv=inv, logdet=logdet,
                      n_sorted=tuple(n_sorted), task_order=tuple(task_order),
                      inv_task_order=tuple(inv_task_order))


def solve_tilde(factor: FastFactor, tildes: Sequence[jnp.ndarray], extra_ndim: int = 0):
    """Apply the inverse in tilde space: original-task-order list in/out.

    ``extra_ndim``: number of dims in each tilde between the factor's batch
    dims and the length axis (e.g. 2 for prediction matrices (..., T, N, n));
    the factor broadcasts across them.
    """
    if factor.lam_eff is not None:
        lam = factor.lam_eff
        if extra_ndim:
            lam = lam.reshape(lam.shape[:-1] + (1,) * extra_ndim + lam.shape[-1:])
        return [tildes[0] / lam]
    n_sorted = factor.n_sorted
    n_min = int(n_sorted[-1])
    r = [int(nl) // n_min for nl in n_sorted]
    ys = [tildes[o] for o in factor.task_order]
    ys = [y.reshape(y.shape[:-1] + (rl, n_min)) for y, rl in zip(ys, r)]
    batch = jnp.broadcast_shapes(*[y.shape[:-2] for y in ys])
    ys = [jnp.broadcast_to(y, batch + y.shape[-2:]) for y in ys]
    y = jnp.concatenate(ys, axis=-2)  # (..., M, n_min)
    inv = factor.inv
    if extra_ndim:
        inv = inv.reshape(inv.shape[:-3] + (1,) * extra_ndim + inv.shape[-3:])
    m = inv.shape[-1]
    if m <= 8:
        # unrolled fused multiply-adds over (n_min,) vectors: the batched
        # (n_min, M, M) x (n_min, M) einsum lowers to 2^14+ tiny 4x4 MXU
        # matmuls and cost ~3 ms of a 12.8 ms derivative-informed step
        # (round-4 measurement); M^2 elementwise terms are pure VPU work
        rows = [sum(inv[..., :, i, j] * y[..., j, :] for j in range(m))
                for i in range(m)]
        out = jnp.stack(rows, axis=-2)  # (..., M, n_min)
    else:
        yt = jnp.swapaxes(y, -1, -2)  # (..., n_min, M)
        out = jnp.einsum("...pij,...pj->...pi", inv, yt)
        out = jnp.swapaxes(out, -1, -2)  # (..., M, n_min)
    outs = []
    off = 0
    for rl in r:
        blk = out[..., off:off + rl, :]
        outs.append(blk.reshape(blk.shape[:-2] + (rl * n_min,)))
        off += rl
    return [outs[o] for o in factor.inv_task_order]


def trace_inverse(factor: FastFactor):
    """Real trace of the inverse Gram (GCV denominator, util.py:376-379)."""
    if factor.lam_eff is not None:
        return (1.0 / factor.lam_eff).real.sum(-1)
    return jnp.diagonal(factor.inv, axis1=-2, axis2=-1).real.sum((-1, -2))


def inv_diag_pointspace(factor: FastFactor, kind: str, point_class_fn):
    """Exact diagonal of K^-1 in point space, per original task.

    Within sorted task l, frequencies couple across the r_l = n_l/n_min
    replicas of each residue, so the point-space diagonal takes r_l distinct
    values indexed by a point "class":

        diag_c = (1/n_l) sum_rho  v_c^H  B_rho  v_c,

    with B_rho the task's (r_l, r_l) inverse block at residue rho and
    characters v_c[j] = exp(-2 pi i c j / r_l) (lattice / Fourier) or
    (-1)^<c, j> (digital / Walsh).  ``point_class_fn(task, n_l, r_l)`` maps
    each of the task's point indices to its class in [0, r_l).

    This is the exact counterpart of the reference's approximation /
    O(n^2 log n) fallback at util.py:381-394.  Returns per-task (..., n_l)
    arrays in original task order.
    """
    n_sorted = factor.n_sorted
    if factor.lam_eff is not None:
        n = factor.lam_eff.shape[-1]
        val = (1.0 / factor.lam_eff).real.mean(-1)
        return [jnp.broadcast_to(val[..., None], val.shape + (n,))]
    n_min = int(n_sorted[-1])
    r = [int(nl) // n_min for nl in n_sorted]
    out_sorted = []
    off = 0
    for l, rl in enumerate(r):
        block = factor.inv[..., off:off + rl, off:off + rl]  # (..., n_min, rl, rl)
        if kind == "fourier":
            c = np.arange(rl)
            v = np.exp(-2j * np.pi * np.outer(c, c) / rl)  # v[c, j]
        else:
            cc = np.arange(rl)
            v = np.where(_popcount_and(cc[:, None], cc[None, :]) % 2 == 1, -1.0, 1.0)
        v = jnp.asarray(v, dtype=block.dtype)
        # diag_c = (1/n_l) sum_rho conj(v[c])^T B_rho v[c]
        vals = jnp.einsum("cj,...pjk,ck->...c", jnp.conj(v), block, v).real
        vals = vals / float(n_sorted[l])
        classes = np.asarray(point_class_fn(factor.task_order[l], int(n_sorted[l]), rl))
        out_sorted.append(jnp.take(vals, jnp.asarray(classes), axis=-1))
        off += rl
    return [out_sorted[o] for o in factor.inv_task_order]


def _popcount_and(a, b):
    x = (a & b).astype(np.uint64)
    count = np.zeros_like(x)
    for _ in range(16):
        count += x & 1
        x >>= 1
        if not x.any():
            break
    return count


def dc_block(factor: FastFactor):
    """(..., T, T) zero-frequency inverse entries in SORTED task order.

    Used by posterior cubature variance/covariance (reference behavior
    abstract_fast_gp.py:82-154: ``inv_cut`` via ``mvec`` indexing).
    """
    if factor.lam_eff is not None:
        return (1.0 / factor.lam_eff[..., 0])[..., None, None]
    r = [int(nl) // int(factor.n_sorted[-1]) for nl in factor.n_sorted]
    offsets = np.concatenate([[0], np.cumsum(r)[:-1]]).astype(np.int64)
    sub = factor.inv[..., 0, :, :]
    return sub[..., offsets, :][..., :, offsets]
