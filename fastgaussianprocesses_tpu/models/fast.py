"""Fast GP engine shared by the lattice (FFT) and digital-net (FWHT) models.

Everything on the training side runs in frequency ("tilde") space in
O(n log n): eigenvalues are transforms of first Gram columns, multitask
coupling is the residue-block system of linalg/fast_solver, and posterior
cubature reads the zero-frequency block.  Mirrors the reference
AbstractFastGP + _FastInverseLogDetCache (abstract_fast_gp.py, util.py:269-425)
re-architected as pure batched JAX.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels import series
from ..linalg import fast_solver as fs
from .abstract import AbstractGP, _as_task_array


class _FastSolver:
    """Frequency-space solver handle for one (params, n-vector) instance.

    ``data``: optional (k1parts_list, ytildes_list) pytree passed explicitly
    so jitted losses receive the large param-independent arrays as arguments
    rather than closure constants (keeps executables small and donatable).

    Documented deviation from the reference's ``_LamCaches`` doubling
    butterfly (util.py:113-132): lam (first-column eigenvalues) is recomputed
    from the cached series parts inside every jitted solve.  Measured on the
    real chip (LAM_RECOMPUTE.json): the full lam + factorization build at
    n=2^20, d=8 costs 1.5 ms — 0.07% of the posterior query it rides in —
    so the butterfly's O(n) merge would be pure complexity with no
    measurable win on this hardware.  During fit the reference recomputes
    too (params change every step).
    """

    def __init__(self, model, raw, n, data=None):
        self.model = model
        self.n = np.asarray(n, dtype=np.int64)
        assert (self.n > 0).all(), "all tasks need data (or a future-n) for fast solves"
        self.task_order, self.inv_task_order = fs.sort_tasks(self.n)
        self.n_sorted = tuple(int(self.n[o]) for o in self.task_order)
        self._data = data
        params = model._transformed(raw)
        kmat_tasks = model._task_gram(raw)
        scale, ls = params["scale"], params["lengthscales"]
        noise = params["noise"]
        T = model.num_tasks
        lam_pairs = {}
        pair_idx = 0
        for l0 in range(T):
            to0 = self.task_order[l0]
            for l1 in range(l0, T):
                to1 = self.task_order[l1]
                nlen = self.n_sorted[l0]
                a, b = (to0, to1) if to0 <= to1 else (to1, to0)
                if data is not None:
                    k1p = data[0][pair_idx]
                else:
                    k1p = model._get_k1parts_lam(a, b, nlen)
                pair_idx += 1
                k1 = series.kernel_from_parts_t(
                    k1p, model.derivatives[a], model.derivatives[b],
                    model.derivatives_coeffs[a], model.derivatives_coeffs[b],
                    scale, ls)
                lam = model._ft_lam(k1)
                if to0 > to1:
                    lam = jnp.conj(lam)
                lam_pairs[(l0, l1)] = lam
        lams = fs.effective_lams(lam_pairs, self.n_sorted, kmat_tasks, noise,
                                 self.task_order, self.inv_task_order,
                                 model.adaptive_nugget)
        self.factor = fs.factorize(lams, self.n_sorted, self.task_order, self.inv_task_order)
        self.kmat_tasks = kmat_tasks
        self.scale = scale

    # -- solving ---------------------------------------------------------
    def _split(self, ycat):
        sizes = self.n.tolist()
        offs = np.concatenate([[0], np.cumsum(sizes)])
        return [ycat[..., offs[l]:offs[l + 1]] for l in range(len(sizes))]

    def gram_matrix_solve(self, ycat, extra_ndim=0, pre_permuted=False):
        """Real-space solve K^-1 y along the last axis (util.py:338-353).

        ``pre_permuted``: the rows are in the model's query column order
        (lattice: bit-reversed), so the transforms are gather-free plain
        variants and the OUTPUT stays in that order."""
        ys = self._split(ycat)
        yst = [self.model._ft_q(y, pre_permuted) for y in ys]
        zst = fs.solve_tilde(self.factor, yst, extra_ndim=extra_ndim)
        zs = [jnp.real(self.model._ift_q(z, pre_permuted)) for z in zst]
        return jnp.concatenate(zs, -1)

    def gram_quad_diag(self, ycat, extra_ndim=0, pre_permuted=False):
        """Diagonal of ``Y K^-1 Y^T`` for stacked rows ``ycat``.

        Entirely in tilde space: the transforms are unitary (the _stabilize
        wrapper is an exact identity), so ``y^T K^-1 y = sum_l <y~_l, z~_l>``
        by Parseval — skipping gram_matrix_solve's inverse transform and the
        real-space re-multiply saves one transform pass plus one read of the
        (..., sum n) block per posterior-variance chunk.
        """
        ys = self._split(ycat)
        yst = [self.model._ft_q(y, pre_permuted) for y in ys]
        zst = fs.solve_tilde(self.factor, yst, extra_ndim=extra_ndim)
        return sum(jnp.real(jnp.conj(a) * b).sum(-1) for a, b in zip(yst, zst))

    def _ytildes(self):
        if self._data is not None:
            return list(self._data[1])
        return [self.model._get_ytilde_traced(l, int(self.n[l]))
                for l in range(self.model.num_tasks)]

    def norm_logdet_terms(self):
        """MLL quadratic and log-det terms in tilde space (util.py:364-370)."""
        yt = self._ytildes()
        zt = fs.solve_tilde(self.factor, yt)
        ytc = jnp.concatenate(yt, -1)
        ztc = jnp.concatenate(zt, -1)
        norm = jnp.real(jnp.conj(ytc) * ztc).sum(-1, keepdims=True)
        return norm, self.factor.logdet[..., None]

    def gcv_terms(self):
        """Generalized-CV numerator/denominator (util.py:371-380)."""
        yt = self._ytildes()
        zt = fs.solve_tilde(self.factor, yt)
        ztc = jnp.concatenate(zt, -1)
        numer = jnp.real(jnp.conj(ztc) * ztc).sum(-1, keepdims=True)
        tr = fs.trace_inverse(self.factor)
        denom = ((tr / float(self.n.sum())) ** 2)[..., None]
        return numer, denom

    def coeffs(self):
        yt = self._ytildes()
        zt = fs.solve_tilde(self.factor, yt)
        zs = [jnp.real(self.model._ift(z)) for z in zt]
        return jnp.concatenate(zs, -1)

    def inv_diag(self):
        """Exact diagonal of K^-1 in point space (concatenated over tasks)."""
        cols = fs.inv_diag_pointspace(self.factor, self.model._char_kind,
                                      self.model._point_class)
        batch = jnp.broadcast_shapes(*[c.shape[:-1] for c in cols])
        cols = [jnp.broadcast_to(c, batch + c.shape[-1:]) for c in cols]
        return jnp.concatenate(cols, -1)

    def dc_block(self):
        return fs.dc_block(self.factor)


class _HalfSpectrumSolver:
    r"""Single-task Fourier solver on the rfft half spectrum.

    The first Gram column and the observations are REAL, so the full
    spectrum is Hermitian: ``lam_{n-k} = conj(lam_k)``, ``yhat_{n-k} =
    conj(yhat_k)``.  Every reduction the solver protocol needs is then a
    weighted half-spectrum sum (weight 2 except bins 0 and n/2), and every
    transform is an rfft/irfft — halving the FFT work that dominates the
    MLL step (PERF_ANALYSIS.md: the c64 FFT pair is ~82% of the step; rfft
    measures ~2x the full FFT's rate on chip).  Bin-for-bin the effective
    eigenvalues (scaling, noise, floor) match linalg.fast_solver's
    single-task path exactly, so results agree with the full-spectrum
    solver to rounding.

    Selected by ``AbstractFastGP._use_half_spectrum``: single task, Fourier
    character (lattice), no sequence mesh, debug oracle off.
    """

    def __init__(self, model, raw, n, data=None):
        self.model = model
        self.n = np.asarray(n, dtype=np.int64)
        self.task_order, self.inv_task_order = (0,), (0,)
        n0 = int(self.n[0])
        self.n_sorted = (n0,)
        self._data = data
        params = model._transformed(raw)
        kmat_tasks = model._task_gram(raw)
        scale, ls, noise = params["scale"], params["lengthscales"], params["noise"]
        k1p = data[0][0] if data is not None else model._get_k1parts_lam(0, 0, n0)
        k1 = series.kernel_from_parts_t(
            k1p, model.derivatives[0], model.derivatives[0],
            model.derivatives_coeffs[0], model.derivatives_coeffs[0], scale, ls)
        lam = model._ft_lam_half(k1)
        rdt = jnp.abs(lam).dtype
        lam = jnp.sqrt(jnp.asarray(float(n0), dtype=rdt)) * lam
        # single task: the adaptive-nugget trace ratio is identically 1
        lam = lam + noise
        lam = lam * kmat_tasks[..., 0, 0][..., None]
        eps = jnp.finfo(rdt).eps
        # floor differentiated on purpose: see fast_solver.effective_lams
        floor = 8.0 * eps * jnp.max(jnp.abs(lam), axis=-1, keepdims=True)
        self.lam = lam + floor
        self.logdet = self._wsum(jnp.log(jnp.abs(self.lam)))
        self.kmat_tasks = kmat_tasks
        self.scale = scale
        self.factor = fs.FastFactor(
            lam_eff=None, inv=None, logdet=self.logdet,
            n_sorted=self.n_sorted, task_order=self.task_order,
            inv_task_order=self.inv_task_order)

    @staticmethod
    def _wsum(x):
        """Full-spectrum sum from half-spectrum values (Hermitian pairing:
        weight 2 on interior bins, 1 on bins 0 and n/2)."""
        return 2.0 * x.sum(-1) - x[..., 0] - x[..., -1]

    def _lam_b(self, extra_ndim):
        lam = self.lam
        if extra_ndim:
            lam = lam.reshape(lam.shape[:-1] + (1,) * extra_ndim + lam.shape[-1:])
        return lam

    def _ytilde_half(self):
        if self._data is not None:
            return self._data[1][0]
        return self.model._get_ytilde_half_traced(0, int(self.n[0]))

    def norm_logdet_terms(self):
        yt = self._ytilde_half()
        zt = yt / self.lam
        norm = self._wsum(jnp.real(jnp.conj(yt) * zt))[..., None]
        return norm, self.logdet[..., None]

    def gcv_terms(self):
        yt = self._ytilde_half()
        zt = yt / self.lam
        numer = self._wsum(jnp.real(jnp.conj(zt) * zt))[..., None]
        tr = self._wsum(jnp.real(1.0 / self.lam))
        denom = ((tr / float(self.n.sum())) ** 2)[..., None]
        return numer, denom

    def coeffs(self):
        yt = self._ytilde_half()
        return self.model._ift_half(yt / self.lam, int(self.n[0]))

    def gram_matrix_solve(self, ycat, extra_ndim=0, pre_permuted=False):
        yst = self.model._ft_half_q(ycat, pre_permuted)
        return self.model._ift_half_q(yst / self._lam_b(extra_ndim),
                                      int(self.n[0]), pre_permuted)

    def gram_quad_diag(self, ycat, extra_ndim=0, pre_permuted=False):
        yst = self.model._ft_half_q(ycat, pre_permuted)
        zt = yst / self._lam_b(extra_ndim)
        return self._wsum(jnp.real(jnp.conj(yst) * zt))

    def inv_diag(self):
        n0 = int(self.n[0])
        val = self._wsum(jnp.real(1.0 / self.lam)) / float(n0)
        return jnp.broadcast_to(val[..., None], val.shape + (n0,))

    def dc_block(self):
        return (1.0 / self.lam[..., 0])[..., None, None]


class _PermSpectrumSolver:
    r"""Single-task Fourier solver on the FULL spectrum in the Pallas FFT's
    permuted bin order (ops/pallas_fft).

    The permuted layout is a pure relabeling of frequency bins: every
    reduction the solver protocol needs is a plain sum over all n bins, the
    DC bin stays at index 0 (cubature), and forward/inverse transforms are
    layout-consistent by construction.  Bin-for-bin the effective
    eigenvalues match _HalfSpectrumSolver exactly (equality-tested on CPU
    via the interpret-mode kernel, tests/test_pallas_fft.py).

    Selected by ``AbstractFastGP._use_perm_spectrum``: TPU f32, single
    task, Fourier character, pallas-supported n, no sequence mesh, debug
    oracle off.  vs the rfft half-spectrum path the FFT itself is ~2x
    faster (VMEM-fused batched kernel) at the cost of full-length (n vs
    n/2) elementwise eigen ops.
    """

    def __init__(self, model, raw, n, data=None):
        self.model = model
        self.n = np.asarray(n, dtype=np.int64)
        self.task_order, self.inv_task_order = (0,), (0,)
        n0 = int(self.n[0])
        self.n_sorted = (n0,)
        self._data = data
        params = model._transformed(raw)
        kmat_tasks = model._task_gram(raw)
        scale, ls, noise = params["scale"], params["lengthscales"], params["noise"]
        k1p = data[0][0] if data is not None else model._get_k1parts_lam(0, 0, n0)
        k1 = series.kernel_from_parts_t(
            k1p, model.derivatives[0], model.derivatives[0],
            model.derivatives_coeffs[0], model.derivatives_coeffs[0], scale, ls)
        lam = model._ft_lam_perm(k1)
        rdt = jnp.abs(lam).dtype
        lam = jnp.sqrt(jnp.asarray(float(n0), dtype=rdt)) * lam
        lam = lam + noise          # single task: adaptive trace ratio == 1
        lam = lam * kmat_tasks[..., 0, 0][..., None]
        eps = jnp.finfo(rdt).eps
        # floor differentiated on purpose: see fast_solver.effective_lams
        floor = 8.0 * eps * jnp.max(jnp.abs(lam), axis=-1, keepdims=True)
        self.lam = lam + floor
        self.logdet = jnp.sum(jnp.log(jnp.abs(self.lam)), -1)
        self.kmat_tasks = kmat_tasks
        self.scale = scale
        self.factor = fs.FastFactor(
            lam_eff=None, inv=None, logdet=self.logdet,
            n_sorted=self.n_sorted, task_order=self.task_order,
            inv_task_order=self.inv_task_order)

    def _lam_b(self, extra_ndim):
        lam = self.lam
        if extra_ndim:
            lam = lam.reshape(lam.shape[:-1] + (1,) * extra_ndim + lam.shape[-1:])
        return lam

    def _ytilde(self):
        if self._data is not None:
            return self._data[1][0]
        return self.model._get_ytilde_perm_traced(0, int(self.n[0]))

    def norm_logdet_terms(self):
        yt = self._ytilde()
        zt = yt / self.lam
        norm = jnp.sum(jnp.real(jnp.conj(yt) * zt), -1)[..., None]
        return norm, self.logdet[..., None]

    def gcv_terms(self):
        yt = self._ytilde()
        zt = yt / self.lam
        numer = jnp.sum(jnp.real(jnp.conj(zt) * zt), -1)[..., None]
        tr = jnp.sum(jnp.real(1.0 / self.lam), -1)
        denom = ((tr / float(self.n.sum())) ** 2)[..., None]
        return numer, denom

    def coeffs(self):
        yt = self._ytilde()
        return self.model._ift_perm_coeffs(yt / self.lam, int(self.n[0]))

    def gram_matrix_solve(self, ycat, extra_ndim=0, pre_permuted=False):
        yst = self.model._ft_perm_q(ycat, pre_permuted)
        return self.model._ift_perm_q(yst / self._lam_b(extra_ndim),
                                      int(self.n[0]), pre_permuted)

    def gram_quad_diag(self, ycat, extra_ndim=0, pre_permuted=False):
        if pre_permuted and self.lam.ndim == 1:
            # fully-fused VMEM kernel: sum_b Re(1/lam_b) |ft(row)_b|^2 per
            # row with the spectrum never materialized in HBM (pallas_fft
            # .pfft_quad) -- the posterior-variance hot path
            from ..ops.pallas_fft import pfft_quad
            w = jnp.real(1.0 / self.lam)
            return pfft_quad(ycat, w, int(self.n[0]))
        yst = self.model._ft_perm_q(ycat, pre_permuted)
        zt = yst / self._lam_b(extra_ndim)
        return jnp.sum(jnp.real(jnp.conj(yst) * zt), -1)

    def inv_diag(self):
        n0 = int(self.n[0])
        val = jnp.sum(jnp.real(1.0 / self.lam), -1) / float(n0)
        return jnp.broadcast_to(val[..., None], val.shape + (n0,))

    def dc_block(self):
        return (1.0 / self.lam[..., 0])[..., None, None]


def make_solver(model, raw, n, data=None):
    """Solver factory: permuted-spectrum Pallas path, then half-spectrum
    (rfft), then the general multitask solver."""
    if model._use_perm_spectrum(n):
        return _PermSpectrumSolver(model, raw, n, data=data)
    if model._use_half_spectrum(n):
        return _HalfSpectrumSolver(model, raw, n, data=data)
    return _FastSolver(model, raw, n, data=data)


class AbstractFastGP(AbstractGP):
    """Shared machinery for FastGPLattice / FastGPDigitalNetB2."""

    def __init__(self, alpha, *args, **kwargs):
        super().__init__(*args, **kwargs)
        if np.isscalar(alpha):
            alpha = int(alpha) * np.ones(self.d, dtype=np.int64)
        self.alpha = np.asarray(alpha, dtype=np.int64)
        assert self.alpha.shape == (self.d,)
        self._k1parts_cache = {}   # (l0, l1) -> device array (n, p0, p1, d)
        self._k1parts_lam_cache = {}  # (l0, l1, n) -> (p0, p1, d, n) TPU layout
        self._ytilde_cache = {}    # (task, n) -> device array
        self._solver_cache = {}    # (version, n-tuple) -> _FastSolver
        self._kernel_parts_jit = {}
        self._ytilde_parts_cache = {}
        self._ytilde_half_cache = {}        # (task, n) -> rfft ytilde
        self._ytilde_half_parts_cache = {}  # (task, n) -> (re, im)
        self._ytilde_perm_cache = {}        # (task, n) -> perm-spectrum ytilde
        self._ytilde_perm_parts_cache = {}
        self._seq_mesh = None      # sequence-parallel mesh (None = single device)
        self._seq_axis = "seq"
        self._ft_jit = jax.jit(self._ft)
        if self._ft_lam_half is not None:
            self._ft_half_jit = jax.jit(self._ft_half)
        if self._ft_lam_perm is not None:
            self._ft_perm_jit = jax.jit(self._ft_perm)

    # -- sequence parallelism (SP over the transform axis n) --------------
    def use_sequence_sharding(self, mesh, axis: str = "seq"):
        """Shard the transform axis n over a mesh axis for all solves.

        All fast transforms switch to the cross-shard factorized variants
        (parallel/mesh.sharded_fftbr/fwht/ifftbr) and `_fit_data` places
        k1parts/ytilde with the seq NamedSharding, so the whole MLL/GCV/CV
        loss (and its gradients) runs SPMD with GSPMD-inserted collectives.
        Pass ``mesh=None`` to turn off.

        Single-task solves stay elementwise in frequency space (purely local
        + scalar psums).  Multitask solves also work: the residue-class
        reshape (r_l, n_min) crosses the shard boundary, so GSPMD inserts a
        resharding collective around the batched (n_min, M, M) solve —
        correct (parity-tested), with extra ICI traffic proportional to the
        tilde vectors.

        Reference analog: none (single-device); this is the SURVEY section
        2.4 sequence-parallel component.
        """
        self._seq_mesh = mesh
        self._seq_axis = axis
        # transforms changed: drop transform-dependent caches and re-jit.
        # The jitted loss/query executables capture the transform dispatch at
        # TRACE time, so they must go too (an executable traced under the old
        # mesh would silently keep using it).
        self._ytilde_cache.clear()
        self._ytilde_parts_cache.clear()
        self._ytilde_half_cache.clear()
        self._ytilde_half_parts_cache.clear()
        self._ytilde_perm_cache.clear()
        self._ytilde_perm_parts_cache.clear()
        self._solver_cache.clear()
        self._loss_jit.clear()
        self._post_jit.clear()
        self._coeffs_cache = None
        self._ft_jit = jax.jit(self._ft)

    # -- concrete-model hooks -------------------------------------------
    def _ft(self, x):
        raise NotImplementedError

    def _ift(self, x):
        raise NotImplementedError

    def _ominus(self, a, b):
        raise NotImplementedError

    def _parts_from_delta(self, delta, beta, kappa):
        raise NotImplementedError

    # -- caches ----------------------------------------------------------
    def _get_k1parts(self, l0, l1, n):
        """Hyperparameter-independent first-column series terms (util.py:40-62)."""
        assert l0 <= l1
        key = (l0, l1)
        cur = self._k1parts_cache.get(key)
        have = 0 if cur is None else cur.shape[0]
        if n > have:
            xb0 = self._get_xxb(l0, n)[1][have:n]
            xb1 = self._get_xxb(l1, 1)[1][:1]
            fn = self._kernel_parts_jit.get(key)
            if fn is None:
                fn = jax.jit(lambda a, b, _l0=l0, _l1=l1: series.kernel_parts(
                    self._parts_from_delta, a, b, self._ominus,
                    self.derivatives[_l0], self.derivatives[_l1]))
                self._kernel_parts_jit[key] = fn
            new = fn(self._to_device_xb(xb0), self._to_device_xb(xb1))
            cur = new if cur is None else jnp.concatenate([cur, new], 0)
            self._k1parts_cache[key] = cur
        return cur[:n]

    def _to_device_xb(self, xb):
        if np.issubdtype(np.asarray(xb).dtype, np.floating):
            return jnp.asarray(xb, dtype=self.dtype)
        return jnp.asarray(xb)

    def _get_k1parts_lam(self, l0, l1, n):
        """First-column parts in the TPU layout consumed by the solver.

        Shape (p0, p1, d, n): the long point axis LAST so it fills vector
        lanes (see series.kernel_from_parts_t).  The lattice model overrides
        this with a bit-reverse-permuted per-n cache so the hot loop's
        transform is a plain FFT with no gather (TPU gathers cost ~100x the
        FFT)."""
        key = (l0, l1, int(n))
        cached = self._k1parts_lam_cache.get(key)
        if cached is None:
            cached = jnp.moveaxis(self._get_k1parts(l0, l1, n), 0, -1)
            cached = jax.device_put(cached)  # materialize once, outside traces
            self._k1parts_lam_cache[key] = cached
            if len(self._k1parts_lam_cache) > 24:
                self._k1parts_lam_cache.pop(next(iter(self._k1parts_lam_cache)))
        return cached

    def _ft_lam(self, k1):
        """Transform applied to first columns inside the solver."""
        return self._ft(k1)

    def _get_ytilde(self, task, n):
        """Transformed observations (reference _YtildeCache, util.py:164-183).

        Incremental doubling: when the half-size transform is cached, the
        full transform is the one-level radix-2 butterfly
        ``[prev + w*ft(second half), prev - w*ft(second half)] / sqrt(2)``
        (reference util.py:173-183) — O(n) merge + a HALF-size transform
        instead of a full-size transform, and the half-size executable is
        already compiled from the previous level.  A FASTGPS_TPU_DEBUG
        cross-check recomputes in full (reference FASTGP_DEBUG, util.py:179).
        """
        key = (task, n)
        if key not in self._ytilde_cache:
            y = self._y[task]
            assert y.shape[-1] >= n
            prev = self._ytilde_cache.get((task, n // 2))
            if n > 1 and prev is not None and self._seq_mesh is None:
                from ..ops.bitops import log2_int
                from ..ops.transforms import merge_doubling
                half = y[..., n // 2:n]
                half_t = (self._ft_jit(half) if n // 2 > 1
                          else half.astype(self._ftout_dtype()))
                omega = self.get_omega(log2_int(n // 2))
                if not np.isscalar(omega):
                    omega = omega.astype(self._ftout_dtype())
                yt = merge_doubling(prev, half_t, omega)
                from ..config import debug_checks_enabled
                if debug_checks_enabled():
                    full = self._ft_jit(y[..., :n])
                    np.testing.assert_allclose(
                        np.asarray(yt), np.asarray(full), atol=1e-8,
                        err_msg="doubling butterfly != full transform")
            else:
                yt = self._ft_jit(y[..., :n]) if n > 1 else y[..., :n].astype(self._ftout_dtype())
            self._ytilde_cache[key] = yt
            if jnp.iscomplexobj(yt):
                # eager split so jit traces consume REAL constants only
                # (complex constants need a device->host transfer at lowering
                # time, unimplemented on some TPU backends)
                self._ytilde_parts_cache[key] = (jnp.real(yt), jnp.imag(yt))
        return self._ytilde_cache[key]

    # -- half-spectrum (rfft) fast path ----------------------------------
    def _use_half_spectrum(self, n) -> bool:
        """Eligibility for the rfft single-task solver (_HalfSpectrumSolver).

        Requires: a Fourier-character model providing the half-transform
        hooks (_ft_lam_half/_ft_half/_ift_half — the lattice model), ONE
        task, n >= 2, no sequence mesh (the sharded transforms are
        full-spectrum), and the dense debug oracle off (it introspects the
        full factorization)."""
        if getattr(self, "_ft_lam_half", None) is None or self._seq_mesh is not None:
            return False
        if self.num_tasks != 1 or int(np.asarray(n)[0]) < 2:
            return False
        from ..config import debug_checks_enabled
        return not debug_checks_enabled()

    _ft_lam_half = None  # lattice overrides with the rfft hooks
    _ft_lam_perm = None  # lattice overrides with the Pallas perm-FFT hooks

    def _use_perm_spectrum(self, n) -> bool:
        """Eligibility for the permuted-spectrum Pallas solver
        (_PermSpectrumSolver): TPU float32 (the kernel is f32-planes),
        single task at a pallas-supported size, no sequence mesh, debug
        oracle off.  ``FASTGPS_TPU_FORCE_PERM=1`` forces it on CPU (tests
        drive the same code path through the interpret-mode kernel)."""
        if getattr(self, "_ft_lam_perm", None) is None or self._seq_mesh is not None:
            return False
        if self.num_tasks != 1:
            return False
        n0 = int(np.asarray(n)[0])
        from ..ops.pallas_fft import _supported
        if not _supported(n0):
            return False
        import os
        from ..ops.mxu_fft import _on_tpu
        if not (_on_tpu() and self.dtype == jnp.float32):
            if os.environ.get("FASTGPS_TPU_FORCE_PERM") != "1":
                return False
            if self.dtype != jnp.float32:
                return False
        from ..config import debug_checks_enabled
        return not debug_checks_enabled()

    # query-row transforms: ``pre_permuted`` rows are already in the model's
    # query column order (see AbstractGP._train_col_perm), letting Fourier
    # models skip the bit-reversal gather; the default ignores the flag
    def _ft_q(self, v, pre_permuted=False):
        return self._ft(v)

    def _ift_q(self, v, pre_permuted=False):
        return self._ift(v)

    def _ft_half_q(self, v, pre_permuted=False):
        return self._ft_half(v)

    def _ift_half_q(self, v, n, pre_permuted=False):
        return self._ift_half(v, n)

    def _get_ytilde_half(self, task, n):
        """rfft of the observations (the half-spectrum solver's ytilde).

        Computed directly per (task, n) — no doubling butterfly: the
        transform runs once per data change (~0.2 ms at n=2^20), not per
        step, and the half-spectrum merge would need a conjugate-flip
        reconstruction for no measurable win."""
        key = (task, n)
        if key not in self._ytilde_half_cache:
            yt = self._ft_half_jit(self._y[task][..., :n])
            self._ytilde_half_cache[key] = yt
            self._ytilde_half_parts_cache[key] = (jnp.real(yt), jnp.imag(yt))
        return self._ytilde_half_cache[key]

    def _get_ytilde_half_traced(self, task, n):
        """Half-spectrum ytilde for use INSIDE jit traces (real/imag parts
        recombined — complex closure constants are untransferable on some
        TPU backends; see _get_ytilde_traced)."""
        key = (task, n)
        if key not in self._ytilde_half_parts_cache:
            self._get_ytilde_half(task, n)
        re, im = self._ytilde_half_parts_cache[key]
        return re + 1j * im

    def _get_ytilde_perm(self, task, n):
        """Permuted-spectrum ytilde (the Pallas solver's ytilde); computed
        directly per (task, n) like the half-spectrum variant."""
        key = (task, n)
        if key not in self._ytilde_perm_cache:
            yt = self._ft_perm_jit(self._y[task][..., :n])
            self._ytilde_perm_cache[key] = yt
            self._ytilde_perm_parts_cache[key] = (jnp.real(yt), jnp.imag(yt))
        return self._ytilde_perm_cache[key]

    def _get_ytilde_perm_traced(self, task, n):
        key = (task, n)
        if key not in self._ytilde_perm_parts_cache:
            self._get_ytilde_perm(task, n)
        re, im = self._ytilde_perm_parts_cache[key]
        return re + 1j * im

    def _get_ytilde_traced(self, task, n):
        """ytilde for use INSIDE jit traces.

        Complex closure constants force a device->host transfer during
        lowering, which some TPU backends cannot do for complex64; cache the
        real/imag parts separately (real constants transfer fine) and
        recombine in-trace.
        """
        key = (task, n)
        parts = self._ytilde_parts_cache.get(key)
        if parts is None:
            yt = self._get_ytilde(task, n)
            if not jnp.iscomplexobj(yt):
                return yt
            parts = self._ytilde_parts_cache[key]
        re, im = parts
        return (re + 1j * im).astype(self._ftout_dtype())

    def _ftout_dtype(self):
        raise NotImplementedError

    def _on_data_change(self):
        # y only ever grows by appending, so ytilde entries for prefix sizes
        # stay valid — keeping them is what makes the doubling butterfly in
        # _get_ytilde an O(n) update (reference _YtildeCache semantics).
        for (task, n) in list(self._ytilde_cache):
            if n > self._y[task].shape[-1]:
                del self._ytilde_cache[(task, n)]
                self._ytilde_parts_cache.pop((task, n), None)
        for (task, n) in list(self._ytilde_half_cache):
            if n > self._y[task].shape[-1]:
                del self._ytilde_half_cache[(task, n)]
                self._ytilde_half_parts_cache.pop((task, n), None)
        for (task, n) in list(self._ytilde_perm_cache):
            if n > self._y[task].shape[-1]:
                del self._ytilde_perm_cache[(task, n)]
                self._ytilde_perm_parts_cache.pop((task, n), None)
        self._solver_cache.clear()

    # -- solver ----------------------------------------------------------
    def _solver(self, n=None):
        n = self._norm_n(n) if n is not None else self.n.copy()
        assert _all_pow2(n), "fast GPs require power-of-two sample counts"
        key = (self._version, tuple(int(v) for v in n))
        if key not in self._solver_cache:
            # warm the k1parts caches outside any trace
            self._warm_k1parts(n)
            solver = make_solver(self, self._raw_dict(), n)
            from ..config import debug_checks_enabled
            if debug_checks_enabled():
                from ..utils.debug import check_fast_solver
                check_fast_solver(self, solver)
            self._solver_cache[key] = solver
            if len(self._solver_cache) > 8:
                self._solver_cache.pop(next(iter(self._solver_cache)))
        return self._solver_cache[key]

    def _warm_k1parts(self, n):
        task_order, _ = fs.sort_tasks(n)
        T = self.num_tasks
        for l0 in range(T):
            for l1 in range(l0, T):
                to0, to1 = task_order[l0], task_order[l1]
                nlen = int(n[task_order[l0]])
                self._get_k1parts_lam(min(to0, to1), max(to0, to1), nlen)

    def _warm_for_fit(self):
        self._warm_k1parts(self.n)
        if self._use_perm_spectrum(self.n):
            self._get_ytilde_perm(0, int(self.n[0]))
        elif self._use_half_spectrum(self.n):
            self._get_ytilde_half(0, int(self.n[0]))
        else:
            for l in range(self.num_tasks):
                self._get_ytilde(l, int(self.n[l]))

    def _warm_extra(self, n):
        # future-n queries need first-column caches at the projected sizes
        self._warm_k1parts(np.asarray(n, dtype=np.int64))

    def _fit_data(self):
        """(k1parts, ytildes) pytree handed to the jitted loss as arguments.

        In half-spectrum mode the ytilde leg carries the rfft form (what
        _HalfSpectrumSolver consumes); the two sides agree because both
        dispatch on _use_half_spectrum."""
        task_order, _ = fs.sort_tasks(self.n)
        T = self.num_tasks
        k1parts = []
        for l0 in range(T):
            for l1 in range(l0, T):
                to0, to1 = task_order[l0], task_order[l1]
                nlen = int(self.n[task_order[l0]])
                k1parts.append(self._get_k1parts_lam(min(to0, to1), max(to0, to1), nlen))
        if self._use_perm_spectrum(self.n):
            ytildes = [self._get_ytilde_perm(0, int(self.n[0]))]
        elif self._use_half_spectrum(self.n):
            ytildes = [self._get_ytilde_half(0, int(self.n[0]))]
        else:
            ytildes = [self._get_ytilde(l, int(self.n[l])) for l in range(T)]
        if self._seq_mesh is not None:
            from ..parallel.mesh import seq_sharding_for
            k1parts = [jax.device_put(p, seq_sharding_for(p.ndim, self._seq_mesh,
                                                          self._seq_axis))
                       for p in k1parts]
            ytildes = [jax.device_put(y, seq_sharding_for(y.ndim, self._seq_mesh,
                                                          self._seq_axis))
                       for y in ytildes]
        return (tuple(k1parts), tuple(ytildes))

    def _solver_pure(self, raw, data=None):
        return make_solver(self, raw, self.n, data=data)

    def _query_solver_any(self, raw, n):
        return make_solver(self, raw, np.asarray(n, dtype=np.int64))

    # -- data ingestion guards (abstract_fast_gp.py:32-40) ---------------
    def get_x_next(self, n, task=None):
        n_arr = np.asarray([n] if isinstance(n, (int, np.integer)) else n, dtype=np.int64)
        assert _all_pow2(n_arr), "sample sizes must be powers of 2"
        return super().get_x_next(n, task=task)

    def add_y_next(self, y_next, task=None):
        super().add_y_next(y_next, task=task)
        assert _all_pow2(self.n), "total samples must be powers of 2"

    def _norm_n(self, n):
        n = super()._norm_n(n)
        assert _all_pow2(n), "n must be powers of 2 >= current sample counts"
        return n

    def _query_itemsize(self):
        # lattice queries move complex FFT buffers (2x real)
        return jnp.dtype(self._ftout_dtype()).itemsize

    # -- kernel evaluation ----------------------------------------------
    def _part_dim(self, delta_j, j: int, b: int, k: int):
        """One dimension's series term (concrete models override).

        CONTRACT (required by series.kernel_fused_scan, which groups
        dimensions by the static signature ``(alpha_j, b, k)`` and evaluates
        one group representative ``j`` for the whole group): the return value
        may depend on ``j`` ONLY through ``self.alpha[j]``.  An override
        whose j-dependence goes beyond alpha breaks cross-kernel queries
        silently (round-3 ADVICE).
        """
        raise NotImplementedError

    # models may provide a side-wise pair evaluator (see kernel_fused_scan)
    _part_dim_pair = None

    def _kernel_explicit(self, x0, x1, beta0, beta1, c0, c1, scale, lengthscales):
        # scan-fused per-dimension accumulation: live buffers are O(N * n)
        # regardless of d — never the (N, n, d) delta stack XLA reassembled
        # from the plain fused path (42 GB at N-chunk=64, n=2^20, d=8), nor
        # the (N, n, p0, p1, d) parts stack (550 GB at N=2^14, n=2^20, d=8)
        return series.kernel_fused_scan(self._part_dim, x0, x1, self._ominus,
                                        beta0, beta1, c0, c1, scale,
                                        lengthscales, self.alpha,
                                        part_dim_pair_fn=self._part_dim_pair)

    # -- fast cubature (abstract_fast_gp.py:65-154) ----------------------
    def post_cubature_mean(self, task=None):
        """Closed-form posterior mean of the integral over [0,1]^d.

        SI/DSI kernels integrate to ``scale``, so only the DC component of
        the coefficients survives (abstract_fast_gp.py:65-81).
        """
        kmat_tasks = self.gram_matrix_tasks
        coeffs = self.coeffs
        if task is None:
            task = self.default_task
        task, inttask = _as_task_array(task, self.num_tasks)
        offs = np.concatenate([[0], np.cumsum(self.n)])
        pieces = []
        for l in range(self.num_tasks):
            cl = (self.scale * coeffs[..., offs[l]:offs[l + 1]])[..., None, :]
            pieces.append(cl * kmat_tasks[..., task, l, None])
        pcmean = jnp.concatenate(pieces, -1).sum(-1)
        return pcmean[..., 0] if inttask else pcmean

    def _cubature_quad_term(self, solver, taskL, taskR):
        """(..., TL, TR) quadratic correction from the DC inverse block."""
        kmat_tasks = self.gram_matrix_tasks
        inv_cut = solver.dc_block()  # (..., T, T) sorted order
        to = list(solver.task_order)
        nord = np.asarray(solver.n_sorted, dtype=np.float64)
        nsqrts = jnp.asarray(np.sqrt(nord[:, None] * nord[None, :]), dtype=jnp.abs(inv_cut).dtype)
        cdt = inv_cut.dtype
        kl = kmat_tasks[..., taskL, :][..., :, to].astype(cdt)
        kr = kmat_tasks[..., to, :][..., :, taskR].astype(cdt)
        return jnp.real(jnp.einsum("...ij,...jk,...kl->...il", kl, nsqrts * inv_cut, kr))

    def post_cubature_var(self, task=None, n=None):
        """Posterior cubature variance (abstract_fast_gp.py:82-109)."""
        n = self._norm_n(n)
        solver = self._solver(n)
        kmat_tasks = self.gram_matrix_tasks
        if task is None:
            task = self.default_task
        task, inttask = _as_task_array(task, self.num_tasks)
        term = self._cubature_quad_term(solver, task, task)
        term = jnp.diagonal(term, axis1=-2, axis2=-1)
        pcvar = self.scale * kmat_tasks[..., task, task] - self.scale ** 2 * term
        pcvar = jnp.maximum(pcvar, 0.0)
        return pcvar[..., 0] if inttask else pcvar

    def post_cubature_cov(self, task0=None, task1=None, n=None):
        """Posterior cubature covariance (abstract_fast_gp.py:110-154)."""
        n = self._norm_n(n)
        solver = self._solver(n)
        kmat_tasks = self.gram_matrix_tasks
        if task0 is None:
            task0 = self.default_task
        if task1 is None:
            task1 = self.default_task
        task0, inttask0 = _as_task_array(task0, self.num_tasks)
        task1, inttask1 = _as_task_array(task1, self.num_tasks)
        equal = np.array_equal(task0, task1)
        term = self._cubature_quad_term(solver, task0, task1)
        prior = kmat_tasks[..., task0, :][..., :, task1]
        pccov = self.scale[..., None] * prior - self.scale[..., None] ** 2 * term
        if equal:
            tvec = np.arange(pccov.shape[-1])
            diag = jnp.maximum(pccov[..., tvec, tvec], 0.0)
            pccov = pccov.at[..., tvec, tvec].set(diag)
        if inttask0 and inttask1:
            return pccov[..., 0, 0]
        if inttask0:
            return pccov[..., 0, :]
        if inttask1:
            return pccov[..., :, 0]
        return pccov


def _all_pow2(n):
    n = np.asarray(n)
    return bool(np.logical_or(n == 0, (n & (n - 1)) == 0).all())
