r"""Pallas TPU FFT with a permuted-spectrum layout (batched, VMEM-fused).

Why: XLA's TPU FFT and the einsum-factorized ``mxu_fft`` both materialize
every Cooley-Tukey stage in HBM.  At n = 2^20 c64 that is ~5 full passes
(~100 MB/row); measured batched throughput is 342-486 us/row against a
~55 us compute floor (round-5 roofline, PERF_ANALYSIS.md).  This module
runs the whole inner DFT chain of each row inside VMEM: two HBM passes
total (pass A matmul in XLA, pass B fused in one Pallas kernel).

Factorization (validated against np.fft.fft):

    n = A * B,  B = Bh * Bl,   j = a*B + bh*Bl + bl,
    k = k1 + A*kh + A*Bh*kl,   A = 128, Bl <= 128

    pass A : Y[k1, b]       = sum_a F_A[k1, a] x[a, b]          (XLA einsum)
    tw 1   : Y[k1, bh, bl] *= w_n^{k1 bh Bl} * w_n^{k1 bl}      (Pallas)
    DFT_Bh : Z[kh, k1, bl]  = sum_bh F_Bh[kh, bh] Y[k1, bh, bl]
    tw 2   : Z             *= w_B^{kh bl}
    DFT_Bl : O[kh, k1, kl]  = sum_bl Z[kh, k1, bl] F_Bl[kl, bl]

The output is returned in the kernel-native layout ``(Bh, A, Bl)`` --
``X_p.reshape(Bh, A, Bl)[kh, k1, kl] == X[k1 + A*kh + A*Bh*kl]`` -- a fixed
permutation of the spectrum (``spectrum_perm``).  Writing natural order
would force a lane-crossing transpose of every output tile; the eigen-space
GP solver never needs natural order (elementwise bin ops + full-spectrum
reductions + the DC bin, which stays at index 0), so the permutation is
simply part of the transform contract.  ``pifft`` consumes the same layout
and returns natural-order signals.

Complex arithmetic is carried as separate (re, im) float32 planes: Pallas
TPU has no complex dtype, and split planes keep every matmul a real MXU
contraction (4 real dots per complex stage; 2 for the real-input forward).

Both directions are wrapped in ``jax.custom_vjp``: the transforms are
C-linear with symmetric DFT matrices, so the VJP of ``pfft`` is
``n * pifft`` applied to the cotangent and vice versa (transpose = the
conjugate DFT on un-conjugated cotangents, which is exactly the inverse
kernel's table set).

Reference context: the reference's hot op is ``qmcpy.fftbr_torch``
(/root/reference/fastgps/fast_gp_lattice.py:224-225); this module is the
TPU-native replacement for its role in the O(n log n) solve.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bitops import log2_int

_MIN_M = 14           # below this the backend FFT is cheap enough
_MAX_M = 22           # VMEM plan exists up to 2^22


def _supported(n: int) -> bool:
    return n == (n & -n) and _MIN_M <= log2_int(n) <= _MAX_M


def _interpret() -> bool:
    """Interpreter mode off-TPU (CPU tests drive the same code path)."""
    return jax.default_backend() == "cpu"


@functools.lru_cache(maxsize=None)
def _plan(n: int):
    """(A, Bh, Bl, K1B): factor sizes and the k1 block width.

    A is chosen so the Pallas stage gets full-width (<=128 x 128) MXU
    contractions: for n >= 2^17, B = Bh*Bl with Bl = 128 and Bh as close
    to 128 as n allows (n = 2^20 -> 64 * 128 * 128)."""
    if n >= (1 << 17):
        A = max(64, min(256, n >> 14))
    else:
        A = 128
    B = n // A
    Bl = min(128, B)
    Bh = B // Bl
    # ~6 live (K1B, B) c64-plane buffers must fit VMEM alongside pipelining
    K1B = min(128, A)
    while K1B > 8 and 6 * K1B * B * 8 > (8 << 20):
        K1B //= 2
    return A, Bh, Bl, K1B


@functools.lru_cache(maxsize=None)
def _tables(n: int, inverse: bool):
    """Host-side DFT/twiddle tables as float32 (re, im) numpy pairs."""
    A, Bh, Bl, _ = _plan(n)
    B = Bh * Bl
    sign = +1.0 if inverse else -1.0

    def w(num, den):
        ph = (sign * 2.0 * np.pi / den) * num
        return np.cos(ph), np.sin(ph)

    def dft(m):
        j = np.arange(m, dtype=np.float64)
        return w(np.outer(j, j), m)

    FA = dft(A)
    FBh = dft(Bh)
    FBl = dft(Bl)
    k1 = np.arange(A, dtype=np.float64)[:, None]
    T1 = w(k1 * np.arange(Bh, dtype=np.float64)[None, :] * Bl, n)
    T2 = w(k1 * np.arange(Bl, dtype=np.float64)[None, :], n)
    T3 = w(np.outer(np.arange(Bh, dtype=np.float64),
                    np.arange(Bl, dtype=np.float64)), B)
    to32 = lambda p: (np.ascontiguousarray(p[0], dtype=np.float32),
                      np.ascontiguousarray(p[1], dtype=np.float32))
    return {"FA": to32(FA), "FBh": to32(FBh), "FBl": to32(FBl),
            "T1": to32(T1), "T2": to32(T2), "T3": to32(T3)}


@functools.lru_cache(maxsize=None)
def spectrum_perm(n: int) -> np.ndarray:
    """``perm`` with ``X_permuted[p] == X_natural[perm[p]]``."""
    A, Bh, Bl, _ = _plan(n)
    kh = np.arange(Bh)[:, None, None]
    k1 = np.arange(A)[None, :, None]
    kl = np.arange(Bl)[None, None, :]
    return (k1 + A * kh + A * Bh * kl).reshape(n)


def _passb_kernel(yr_ref, yi_ref, t1r, t1i, t2r, t2i, t3r, t3i,
                  fbhr, fbhi, fblr, fbli, outr_ref, outi_ref):
    """All contractions 2D (einsum/3D dots broadcast-lower or fragment the
    MXU in Pallas): in block (bh, k1, bl), out block (kh, k1, kl)."""
    Bh, K1B, Bl = yr_ref.shape[1:]
    yr = yr_ref[0]                      # (Bh, K1B, Bl) = (bh, k1, bl)
    yi = yi_ref[0]
    # twiddle 1: w_n^{k1 b} = T1[k1, bh] * T2[k1, bl]
    a_r = jnp.transpose(t1r[:], (1, 0))[:, :, None]   # (Bh, K1B, 1)
    a_i = jnp.transpose(t1i[:], (1, 0))[:, :, None]
    yr, yi = yr * a_r - yi * a_i, yr * a_i + yi * a_r
    b_r, b_i = t2r[:][None, :, :], t2i[:][None, :, :]
    yr, yi = yr * b_r - yi * b_i, yr * b_i + yi * b_r
    d2 = (((1,), (0,)), ((), ()))

    # DFT over bh: (kh, bh) @ (bh, K1B*Bl) -> (kh, K1B, bl)
    yr2 = yr.reshape(Bh, K1B * Bl)
    yi2 = yi.reshape(Bh, K1B * Bl)

    def doth(m, z2):
        return jax.lax.dot_general(m, z2, d2,
                                   preferred_element_type=jnp.float32)

    zr = (doth(fbhr[:], yr2) - doth(fbhi[:], yi2)).reshape(Bh, K1B, Bl)
    zi = (doth(fbhr[:], yi2) + doth(fbhi[:], yr2)).reshape(Bh, K1B, Bl)
    # twiddle 2: w_B^{kh bl}
    c_r, c_i = t3r[:][:, None, :], t3i[:][:, None, :]
    zr, zi = zr * c_r - zi * c_i, zr * c_i + zi * c_r
    # DFT over bl: (kh*K1B, bl) @ (bl, kl) -> (kh, K1B, kl)
    zr2 = zr.reshape(Bh * K1B, Bl)
    zi2 = zi.reshape(Bh * K1B, Bl)

    def dotl(z2, m):
        return jax.lax.dot_general(z2, m, d2,
                                   preferred_element_type=jnp.float32)

    rr, ri = dotl(zr2, fblr[:]), dotl(zr2, fbli[:])
    ir, ii = dotl(zi2, fblr[:]), dotl(zi2, fbli[:])
    outr_ref[0] = (rr - ii).reshape(Bh, K1B, Bl)
    outi_ref[0] = (ri + ir).reshape(Bh, K1B, Bl)


def _passb(Yr, Yi, n: int, inverse: bool):
    """(R, Bh, A, Bl) planes -> (R, Bh, A, Bl) permuted-spectrum planes."""
    A, Bh, Bl, K1B = _plan(n)
    R = Yr.shape[0]
    J = A // K1B
    t = _tables(n, inverse)
    consts = [t["T1"][0], t["T1"][1], t["T2"][0], t["T2"][1],
              t["T3"][0], t["T3"][1], t["FBh"][0], t["FBh"][1],
              t["FBl"][0], t["FBl"][1]]
    consts = [jnp.asarray(c) for c in consts]
    blocked_k1 = [True, True, True, True, False, False,
                  False, False, False, False]

    # index-map literals must stay int32: under global x64 plain `0`s
    # trace as i64, which Mosaic cannot legalize (same as pallas_fwht)
    z = np.int32(0)
    in_specs = [pl.BlockSpec((1, Bh, K1B, Bl), lambda r, j: (r, z, j, z),
                             memory_space=pltpu.VMEM)] * 2
    for cst, blk in zip(consts, blocked_k1):
        if blk:
            in_specs.append(pl.BlockSpec(
                (K1B, cst.shape[1]), lambda r, j: (j, z),
                memory_space=pltpu.VMEM))
        else:
            in_specs.append(pl.BlockSpec(
                cst.shape, lambda r, j: (z, z), memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((1, Bh, K1B, Bl), lambda r, j: (r, z, j, z),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((R, Bh, A, Bl), jnp.float32)
    outr, outi = pl.pallas_call(
        _passb_kernel,
        grid=(R, J),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec),
        out_shape=(out_shape, out_shape),
        interpret=_interpret(),
    )(Yr, Yi, *consts)
    return outr, outi


def _passa(xr, xi, n: int, inverse: bool):
    """Natural (R, n) planes -> (R, Bh, A, Bl) planes (the k1 DFT),
    emitted directly in the bh-major layout pass B consumes."""
    A, Bh, Bl, _ = _plan(n)
    t = _tables(n, inverse)
    FAr, FAi = jnp.asarray(t["FA"][0]), jnp.asarray(t["FA"][1])
    x4r = xr.reshape(xr.shape[0], A, Bh, Bl)
    if xi is None:
        Yr = jnp.einsum("ka,rahl->rhkl", FAr, x4r)
        Yi = jnp.einsum("ka,rahl->rhkl", FAi, x4r)
    else:
        x4i = xi.reshape(xi.shape[0], A, Bh, Bl)
        Yr = jnp.einsum("ka,rahl->rhkl", FAr, x4r) - jnp.einsum(
            "ka,rahl->rhkl", FAi, x4i)
        Yi = jnp.einsum("ka,rahl->rhkl", FAi, x4r) + jnp.einsum(
            "ka,rahl->rhkl", FAr, x4i)
    return Yr, Yi


def _flatten_batch(x):
    lead = x.shape[:-1]
    R = int(np.prod(lead)) if lead else 1
    return x.reshape((R, x.shape[-1])), lead


def _fft_planes_impl(xr, xi, n: int, inverse: bool):
    Yr, Yi = _passa(xr, xi, n, inverse)
    outr, outi = _passb(Yr, Yi, n, inverse)
    R = xr.shape[0]
    return outr.reshape(R, n), outi.reshape(R, n)


def _ifft_planes_impl(Xr, Xi, n: int, real_out: bool):
    """Permuted-spectrum planes -> natural planes.  Applies 1/n."""
    A, Bh, Bl, K1B = _plan(n)
    R = Xr.shape[0]
    # run pass B backwards: undo DFT_Bl, tw2, DFT_Bh, tw1 -- all with the
    # conjugate (inverse=True) tables; this is itself "pass B" of the
    # inverse factorization read in reverse stage order
    X4r = Xr.reshape(R, Bh, A, Bl)
    X4i = Xi.reshape(R, Bh, A, Bl)
    Yr, Yi = _passb_inv(X4r, X4i, n)      # (R, Bh, A, Bl), bh-major
    # pass A inverse: contract k1 with conj(F_A), scale 1/n; the output
    # must come back in natural j = a*B + bh*Bl + bl order -> (r, a, bh, bl)
    t = _tables(n, inverse=True)
    FAr = jnp.asarray(t["FA"][0]) * np.float32(1.0 / n)
    FAi = jnp.asarray(t["FA"][1]) * np.float32(1.0 / n)
    xr = (jnp.einsum("ak,rbkl->rabl", FAr, Yr)
          - jnp.einsum("ak,rbkl->rabl", FAi, Yi))
    xr = xr.reshape(R, n)
    if real_out:
        return xr, None
    xi = (jnp.einsum("ak,rbkl->rabl", FAi, Yr)
          + jnp.einsum("ak,rbkl->rabl", FAr, Yi))
    return xr, xi.reshape(R, n)


def _passb_inv_kernel(xr_ref, xi_ref, t1tr, t1ti, t2r, t2i, t3r, t3i,
                      fbhr, fbhi, fblr, fbli, outr_ref, outi_ref):
    """Undo pass B.  In block (kh, k1, kl); OUT block (bh, k1, bl) -- the
    bh-major layout falls straight out of the dot_generals (no transpose);
    the XLA pass A inverse consumes it as such."""
    Bh, K1B, Bl = xr_ref.shape[1:]
    zr = xr_ref[0]
    zi = xi_ref[0]
    # undo DFT_Bl: fold leading dims, 2D (kh*K1B, kl) @ (kl, bl)
    zr2 = zr.reshape(Bh * K1B, Bl)
    zi2 = zi.reshape(Bh * K1B, Bl)
    d2 = (((1,), (0,)), ((), ()))

    def dotl(z2, m):
        return jax.lax.dot_general(z2, m, d2,
                                   preferred_element_type=jnp.float32)

    rr, ri = dotl(zr2, fblr[:]), dotl(zr2, fbli[:])
    ir, ii = dotl(zi2, fblr[:]), dotl(zi2, fbli[:])
    zr = (rr - ii).reshape(Bh, K1B, Bl)
    zi = (ri + ir).reshape(Bh, K1B, Bl)
    # undo twiddle 2: conj table already baked (inverse tables)
    c_r, c_i = t3r[:][:, None, :], t3i[:][:, None, :]
    zr, zi = zr * c_r - zi * c_i, zr * c_i + zi * c_r
    # undo DFT_Bh: (bh, kh) @ (kh, K1B*Bl) -> (bh, K1B, Bl)
    zr2 = zr.reshape(Bh, K1B * Bl)
    zi2 = zi.reshape(Bh, K1B * Bl)

    def doth(m, z2):
        return jax.lax.dot_general(m, z2, d2,
                                   preferred_element_type=jnp.float32)

    yr = (doth(fbhr[:], zr2) - doth(fbhi[:], zi2)).reshape(Bh, K1B, Bl)
    yi = (doth(fbhr[:], zi2) + doth(fbhi[:], zr2)).reshape(Bh, K1B, Bl)
    # undo twiddle 1: T1 arrives (k1, bh) like the forward (a lane-dim
    # blocked transpose violates Mosaic's (8,128) block tiling); the
    # (K1B, Bh) -> (Bh, K1B) transpose is a tiny in-VMEM op
    a_r = jnp.transpose(t1tr[:], (1, 0))[:, :, None]
    a_i = jnp.transpose(t1ti[:], (1, 0))[:, :, None]
    yr, yi = yr * a_r - yi * a_i, yr * a_i + yi * a_r
    b_r, b_i = t2r[:][None, :, :], t2i[:][None, :, :]
    outr_ref[0] = yr * b_r - yi * b_i
    outi_ref[0] = yr * b_i + yi * b_r


def _passb_inv(X4r, X4i, n: int):
    """(R, Bh, A, Bl) permuted planes -> (R, Bh, A, Bl) pre-pass-A planes
    (bh-major layout; see _passb_inv_kernel)."""
    A, Bh, Bl, K1B = _plan(n)
    R = X4r.shape[0]
    J = A // K1B
    t = _tables(n, inverse=True)
    consts = [t["T1"][0], t["T1"][1],
              t["T2"][0], t["T2"][1],
              t["T3"][0], t["T3"][1], t["FBh"][0], t["FBh"][1],
              t["FBl"][0], t["FBl"][1]]
    consts = [jnp.asarray(c) for c in consts]
    z = np.int32(0)
    in_specs = [pl.BlockSpec((1, Bh, K1B, Bl), lambda r, j: (r, z, j, z),
                             memory_space=pltpu.VMEM)] * 2
    # T1 (A, Bh) and T2 (A, Bl) blocked along k1 (sublane), like forward
    in_specs.append(pl.BlockSpec((K1B, Bh), lambda r, j: (j, z),
                                 memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((K1B, Bh), lambda r, j: (j, z),
                                 memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((K1B, Bl), lambda r, j: (j, z),
                                 memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((K1B, Bl), lambda r, j: (j, z),
                                 memory_space=pltpu.VMEM))
    for cst in consts[4:]:
        in_specs.append(pl.BlockSpec(cst.shape, lambda r, j: (z, z),
                                     memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((1, Bh, K1B, Bl), lambda r, j: (r, z, j, z),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((R, Bh, A, Bl), jnp.float32)
    return pl.pallas_call(
        _passb_inv_kernel,
        grid=(R, J),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec),
        out_shape=(out_shape, out_shape),
        interpret=_interpret(),
    )(X4r, X4i, *consts)


# ---------------------------------------------------------------------------
# differentiable public ops (complex in/out; planes handled internally)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def pfft(x, n: int):
    """Unnormalized DFT of the last axis, PERMUTED spectrum order
    (``spectrum_perm``).  ``x`` real or complex; returns complex64."""
    return _pfft_impl(x, n)


def _pfft_impl(x, n):
    x2, lead = _flatten_batch(x)
    if jnp.iscomplexobj(x2):
        xr = jnp.real(x2).astype(jnp.float32)
        xi = jnp.imag(x2).astype(jnp.float32)
    else:
        xr, xi = x2.astype(jnp.float32), None
    outr, outi = _fft_planes_impl(xr, xi, n, inverse=False)
    return jax.lax.complex(outr, outi).reshape(lead + (n,))


def _pfft_fwd(x, n):
    return _pfft_impl(x, n), jnp.iscomplexobj(x)


def _pfft_bwd(n, was_complex, g):
    # JAX's fft transpose is UN-conjugated (F^T = F): for pfft = P*F the
    # vjp is F*P^T*g = n*conj(pifft(conj(g))) (matches jnp.fft.fft's vjp
    # modulo the spectrum permutation; pinned by tests/test_pallas_fft.py)
    gx = jnp.conj(pifft(jnp.conj(g), n)) * np.float32(n)
    if not was_complex:
        gx = jnp.real(gx)
    return (gx,)


pfft.defvjp(_pfft_fwd, _pfft_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def pifft(X, n: int):
    """Inverse of :func:`pfft` (includes 1/n); input permuted order,
    output natural order, complex64."""
    return _pifft_impl(X, n)


def _pifft_impl(X, n):
    X2, lead = _flatten_batch(X)
    Xr = jnp.real(X2).astype(jnp.float32)
    Xi = jnp.imag(X2).astype(jnp.float32)
    xr, xi = _ifft_planes_impl(Xr, Xi, n, real_out=False)
    return jax.lax.complex(xr, xi).reshape(lead + (n,))


def _pifft_fwd(X, n):
    return _pifft_impl(X, n), None


def _pifft_bwd(n, _, g):
    # transpose of (1/n)*conj(F)*P^T is (1/n)*P*conj(F):
    return (jnp.conj(pfft(jnp.conj(g), n)) * np.float32(1.0 / n),)


pifft.defvjp(_pifft_fwd, _pifft_bwd)


def _quad_kernel(x_ref, far, fai, t1r, t1i, t2r, t2i, t3r, t3i,
                 fbhr, fbhi, fblr, fbli, w_ref, out_ref):
    """Fused pass A + pass B + weighted quadratic reduction for ONE row
    block: out tile's [0,0] = sum_block w * |Z|^2 where Z is this
    k1-block's slice of the (unnormalized, mean-centered) permuted
    spectrum.  The input row block index depends only on r, so Pallas
    keeps it resident in VMEM across all J k1-cells -- the spectrum never
    touches HBM.  The stabilized DC term is handled by the CALLER (w[0] is
    zeroed; the exact m^2-term is added in XLA)."""
    A, Bh, Bl = x_ref.shape[1:]
    x2 = x_ref[0].reshape(A, Bh * Bl)
    d2 = (((1,), (0,)), ((), ()))

    def dota(m, z2):
        return jax.lax.dot_general(m, z2, d2,
                                   preferred_element_type=jnp.float32)

    K1B = far.shape[0]
    yr = dota(far[:], x2).reshape(K1B, Bh, Bl)   # pass A (real input)
    yi = dota(fai[:], x2).reshape(K1B, Bh, Bl)
    # reorder to (bh, k1, bl) like _passb_kernel's input contract
    yr2 = jnp.transpose(yr, (1, 0, 2))
    yi2 = jnp.transpose(yi, (1, 0, 2))
    a_r = jnp.transpose(t1r[:], (1, 0))[:, :, None]
    a_i = jnp.transpose(t1i[:], (1, 0))[:, :, None]
    yr2, yi2 = yr2 * a_r - yi2 * a_i, yr2 * a_i + yi2 * a_r
    b_r, b_i = t2r[:][None, :, :], t2i[:][None, :, :]
    yr2, yi2 = yr2 * b_r - yi2 * b_i, yr2 * b_i + yi2 * b_r
    yr3 = yr2.reshape(Bh, K1B * Bl)
    yi3 = yi2.reshape(Bh, K1B * Bl)
    zr = (dota(fbhr[:], yr3) - dota(fbhi[:], yi3)).reshape(Bh, K1B, Bl)
    zi = (dota(fbhr[:], yi3) + dota(fbhi[:], yr3)).reshape(Bh, K1B, Bl)
    c_r, c_i = t3r[:][:, None, :], t3i[:][:, None, :]
    zr, zi = zr * c_r - zi * c_i, zr * c_i + zi * c_r
    zr2 = zr.reshape(Bh * K1B, Bl)
    zi2 = zi.reshape(Bh * K1B, Bl)

    def dotl(z2, m):
        return jax.lax.dot_general(z2, m, d2,
                                   preferred_element_type=jnp.float32)

    rr, ri = dotl(zr2, fblr[:]), dotl(zr2, fbli[:])
    ir, ii = dotl(zi2, fblr[:]), dotl(zi2, fbli[:])
    sr = (rr - ii).reshape(Bh, K1B, Bl)
    si = (ri + ir).reshape(Bh, K1B, Bl)
    s = jnp.sum(w_ref[:] * (sr * sr + si * si))
    # scalar-per-cell output as one (8, 128) tile with the value at [0, 0]
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    out_ref[0, 0] = jnp.where((row == 0) & (col == 0), s, 0.0)


def pfft_quad(x, w, n: int):
    """``sum_b w_b * |pfft_stable(x)_b|^2`` per row, fully fused in VMEM.

    ``w`` carries any solver weights (permuted bin order, real, shape
    (n,)); the 1/n orthonormal normalization is folded internally.
    Equivalent to ``jnp.sum(w * abs(pfft_stable(x))**2, -1)``; one 4 MB
    read per n=2^20 row instead of the ~28 MB of the materialized
    two-pass path.  NOT differentiable (query paths only)."""
    A, Bh, Bl, K1B = _plan(n)
    J = A // K1B
    x2, lead = _flatten_batch(x)
    x2 = x2.astype(jnp.float32)
    R = x2.shape[0]
    m = jnp.mean(x2, axis=-1)
    xm = (x2 - m[:, None]).reshape(R, A, Bh, Bl)
    t = _tables(n, inverse=False)
    consts = [t["FA"][0], t["FA"][1],
              t["T1"][0], t["T1"][1], t["T2"][0], t["T2"][1],
              t["T3"][0], t["T3"][1], t["FBh"][0], t["FBh"][1],
              t["FBl"][0], t["FBl"][1]]
    consts = [jnp.asarray(c) for c in consts]
    blocked_k1 = [True, True, True, True, True, True,
                  False, False, False, False, False, False]
    z = np.int32(0)
    in_specs = [
        pl.BlockSpec((1, A, Bh, Bl), lambda r, j: (r, z, z, z),
                     memory_space=pltpu.VMEM),
    ]
    for cst, blk in zip(consts, blocked_k1):
        if blk:
            in_specs.append(pl.BlockSpec(
                (K1B, cst.shape[1]), lambda r, j: (j, z),
                memory_space=pltpu.VMEM))
        else:
            in_specs.append(pl.BlockSpec(
                cst.shape, lambda r, j: (z, z), memory_space=pltpu.VMEM))
    # weights in permuted order, viewed (Bh, A, Bl), blocked along k1;
    # the kernel sees the UNNORMALIZED spectrum so fold in 1/n, and zero
    # the DC weight (its exact stabilized term is added below)
    w32 = jnp.asarray(w, jnp.float32)
    wk = (w32 * np.float32(1.0 / n)).reshape(Bh, A, Bl)
    wk = wk.at[0, 0, 0].set(0.0)
    in_specs.append(pl.BlockSpec((Bh, K1B, Bl), lambda r, j: (z, j, z),
                                 memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        _quad_kernel,
        grid=(R, J),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, 8, 128), lambda r, j: (r, j, z, z),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, J, 8, 128), jnp.float32),
        # the resident row (4 MB double-buffered) + stage temps exceed the
        # default 16 MB scoped-vmem budget at n = 2^20; the chip has more
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(xm, *consts, wk)
    quad = jnp.sum(out[..., 0, 0], -1)
    # exact stabilized DC term: Yhat_dc = m*sqrt(n)  ->  w_dc * n * m^2
    quad = quad + w32[0] * np.float32(n) * m * m
    return quad.reshape(lead)


def pifft_real(X, n: int):
    """Real part of :func:`pifft` without materializing the imag plane."""
    X2, lead = _flatten_batch(X)
    Xr = jnp.real(X2).astype(jnp.float32)
    Xi = jnp.imag(X2).astype(jnp.float32)
    xr, _ = _ifft_planes_impl(Xr, Xi, n, real_out=True)
    return xr.reshape(lead + (n,))
