"""Standard (dense, O(n^3)) Gaussian process regression.

Serves as both a general-purpose GP on arbitrary points/data and as the
semantic oracle for the fast models.  API parity target: fastgps.StandardGP
(standard_gp.py:11-438).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.dense import KERNEL_CLASSES, dense_kernel
from ..points.digital_net import DigitalNetB2
from .abstract import AbstractGP, _as_task_array


class _DataSeq:
    """Wraps user-provided points as a sequence (reference DummyDiscreteDistrib,
    util.py:6-15): refuses to generate beyond the provided n."""

    order = "NATURAL"
    replications = 1

    def __init__(self, x):
        x = np.asarray(x, dtype=np.float64)
        assert x.ndim == 2
        self.x = x
        self.n, self.d = x.shape

    def __call__(self, n_min, n_max):
        assert n_max <= self.n, "cannot generate beyond the provided data"
        return self.x[n_min:n_max]


class _StandardSolver:
    """Dense multitask Cholesky solver (reference _StandardInverseLogDetCache,
    util.py:207-267), with NaN-triggered nugget escalation replacing the
    exception-retry loop (jitted Cholesky raises no exceptions)."""

    def __init__(self, model, raw, n):
        self.model = model
        self.n = np.asarray(n, dtype=np.int64)
        params = model._transformed(raw)
        kmat_tasks = model._task_gram(raw)
        scale, ls = params["scale"], params["lengthscales"]
        noise = params["noise"]
        T = model.num_tasks
        lower = {}
        for l0 in range(T):
            for l1 in range(l0 + 1):
                x0 = model.get_x(l0, n=int(self.n[l0]))
                x1 = model.get_x(l1, n=int(self.n[l1]))
                lower[(l0, l1)] = model._kernel_explicit(
                    x0[:, None, :], x1[None, :, :],
                    model.derivatives[l0], model.derivatives[l1],
                    model.derivatives_coeffs[l0], model.derivatives_coeffs[l1],
                    scale, ls)
        if model.adaptive_nugget:
            tr00 = jnp.trace(lower[(0, 0)], axis1=-2, axis2=-1)
            nus = [noise[..., 0] * jnp.trace(lower[(l, l)], axis1=-2, axis2=-1) / tr00
                   for l in range(T)]
        else:
            nus = [noise[..., 0]] * T
        # rounding-level RELATIVE nugget floor: with a fixed absolute noise
        # and a fitted scale of 1e9+, the condition number passes 1e16 and
        # float64 Cholesky emits NaNs faster than the retry loop can escalate
        # (the reference's unbounded while-retry at util.py:219-237 eventually
        # catches up; a jitted scan cannot be unbounded).  The max eigenvalue
        # is bounded by the trace, so 64*eps*trace caps the condition number
        # at ~1/(64 eps) ~ 7e13 while staying statistically invisible
        # (1.3e-11 at unit scale, n=1024).
        eps = float(jnp.finfo(model.dtype).eps)
        nus = [jnp.maximum(nu, 64.0 * eps * jnp.trace(
            lower[(l, l)], axis1=-2, axis2=-1))
               for l, nu in enumerate(nus)]

        def assemble(spd_factor):
            rows = []
            for l0 in range(T):
                cols = []
                for l1 in range(T):
                    kv = lower[(l0, l1)] if l1 <= l0 else jnp.swapaxes(lower[(l1, l0)], -1, -2)
                    if l0 == l1:
                        kv = kv + (spd_factor * nus[l0])[..., None, None] * jnp.eye(
                            int(self.n[l0]), dtype=kv.dtype)
                    cols.append(kmat_tasks[..., l0, l1, None, None] * kv)
                rows.append(jnp.concatenate(cols, -1))
            return jnp.concatenate(rows, -2)

        # SPD retry: double the nugget factor until the Cholesky succeeds
        # (reference util.py:219-237 catches the exception; jitted Cholesky
        # signals failure via NaNs instead).  A bounded lax.scan of conds is
        # jittable and skips the recompute entirely once the factor is SPD.
        spd0 = jnp.asarray(1.0, dtype=model.dtype)
        chol0 = jnp.linalg.cholesky(assemble(spd0))

        def retry(carry, _):
            spd, chol = carry
            bad = ~jnp.isfinite(chol).all()

            def redo(s):
                s2 = s * 2.0
                return s2, jnp.linalg.cholesky(assemble(s2))

            def keep(s):
                return s, chol

            return jax.lax.cond(bad, redo, keep, spd), None

        (self.spd_factor, chol), _ = jax.lax.scan(retry, (spd0, chol0), None, length=16)
        self.chol = chol
        diag = jnp.diagonal(chol, axis1=-2, axis2=-1)
        self.logdet = 2.0 * jnp.log(diag).sum(-1)
        ntot = int(self.n.sum())
        eye = jnp.eye(ntot, dtype=chol.dtype)
        linv = jax.scipy.linalg.solve_triangular(chol, jnp.broadcast_to(eye, chol.shape), lower=True)
        self.thetainv = jnp.swapaxes(linv, -1, -2) @ linv
        self.kmat_tasks = kmat_tasks
        self.scale, self.lengthscales = scale, ls
        self.noise = noise

    def gram_matrix_solve(self, ycat, extra_ndim=0, pre_permuted=False):
        assert not pre_permuted  # dense path has no query column reorder
        inv = self.thetainv
        if extra_ndim:
            inv = inv.reshape(inv.shape[:-2] + (1,) * extra_ndim + inv.shape[-2:])
        return jnp.einsum("...ij,...j->...i", inv, ycat)

    def gram_quad_diag(self, ycat, extra_ndim=0, pre_permuted=False):
        """Diagonal of ``Y K^-1 Y^T`` (dense path: solve then contract)."""
        return (self.gram_matrix_solve(ycat, extra_ndim=extra_ndim) * ycat).sum(-1)

    def _ycat(self):
        m = self.model
        return jnp.concatenate(
            [jnp.broadcast_to(m._y[l], m.shape_batch + (m._y[l].shape[-1],))
             for l in range(m.num_tasks)], -1)

    def norm_logdet_terms(self):
        y = self._ycat()
        v = self.gram_matrix_solve(y)
        return (y * v).sum(-1, keepdims=True), self.logdet[..., None]

    def gcv_terms(self):
        y = self._ycat()
        v = self.gram_matrix_solve(y)
        numer = (v**2).sum(-1, keepdims=True)
        tr = jnp.trace(self.thetainv, axis1=-2, axis2=-1)
        denom = ((tr / self.thetainv.shape[-1]) ** 2)[..., None]
        return numer, denom

    def coeffs(self):
        return self.gram_matrix_solve(self._ycat())

    def inv_diag(self):
        return jnp.diagonal(self.thetainv, axis1=-2, axis2=-1)


class StandardGP(AbstractGP):
    """Dense GP with Gaussian/Matern kernels on arbitrary point generators
    or user data.

    Args beyond AbstractGP (mirroring standard_gp.py:126-204):
        seqs: generator(s), an int dimension (Sobol' nets with spawned seeds),
            or use ``data={'x': ..., 'y': ...}`` with seqs = dimension.
        kernel_class: 'gaussian' | 'matern12' | 'matern32' | 'matern52'.
        data: dict of fixed observations ingested at construction.

    Worked example (doctest-run by tests/test_doctests.py on CPU float64;
    mirrors the reference's executable docstring, standard_gp.py:14-122):

    >>> import numpy as np, jax.numpy as jnp
    >>> gp = StandardGP(2, seed_for_seq=7)
    >>> x = gp.get_x_next(64)
    >>> y = jnp.sin(2*jnp.pi*x[:, 0]) * jnp.cos(2*jnp.pi*x[:, 1]) + x.sum(1)
    >>> gp.add_y_next(y)
    >>> data = gp.fit(iterations=40, verbose=0)
    >>> data['iterations']
    40
    >>> xq = np.array([[0.1, 0.2], [0.5, 0.5], [0.9, 0.8]])
    >>> pm, pv = gp.post_mean_var(xq)
    >>> [round(float(v), 4) for v in pm]
    [0.4832, 0.9991, 1.5233]
    >>> round(float(gp.post_cubature_mean()), 4)
    1.0002
    >>> pmean, pvar, q, lo, hi = gp.post_ci(xq)
    >>> [round(float(v), 3) for v in lo]
    [0.431, 0.957, 1.45]
    """

    def __init__(self, seqs, num_tasks=None, seed_for_seq=None,
                 noise=1e-4, kernel_class="Gaussian", adaptive_nugget=True,
                 data=None, **kwargs):
        nt = 1 if num_tasks is None else num_tasks
        if data is not None:
            assert isinstance(seqs, int), "data= requires seqs to be the dimension"
            xs = data["x"]
            ys = data["y"]
            if not isinstance(xs, (list, tuple)):
                xs = [xs]
            if not isinstance(ys, (list, tuple)):
                ys = [ys]
            assert len(xs) == nt and len(ys) == nt
            seqs = [_DataSeq(np.asarray(x)) for x in xs]
        else:
            if isinstance(seqs, int):
                seeds = np.random.SeedSequence(seed_for_seq).spawn(nt)
                seqs = [DigitalNetB2(seqs, seed=s, randomize="DS") for s in seeds]
            if not isinstance(seqs, (list, tuple)):
                seqs = [seqs]
        kernel_class = kernel_class.lower()
        assert kernel_class in KERNEL_CLASSES, f"kernel_class must be in {KERNEL_CLASSES}"
        self.kernel_class = kernel_class
        super().__init__(seqs, num_tasks=num_tasks, noise=noise,
                         adaptive_nugget=adaptive_nugget, **kwargs)
        self._solver_cache = {}
        if data is not None:
            self.add_y_next([jnp.asarray(y) for y in ys], task=list(range(nt)))

    # -- kernel ----------------------------------------------------------
    def _kernel_explicit(self, x0, x1, beta0, beta1, c0, c1, scale, lengthscales):
        return dense_kernel(self.kernel_class, x0, x1, beta0, beta1, c0, c1,
                            scale, lengthscales)

    # -- solver ----------------------------------------------------------
    def _solver(self, n=None):
        n = self._norm_n(n) if n is not None else self.n.copy()
        key = (self._version, tuple(int(v) for v in n))
        if key not in self._solver_cache:
            for l in range(self.num_tasks):
                self._get_xxb(l, int(n[l]))
            self._solver_cache[key] = _StandardSolver(self, self._raw_dict(), n)
            if len(self._solver_cache) > 8:
                self._solver_cache.pop(next(iter(self._solver_cache)))
        return self._solver_cache[key]

    def _warm_for_fit(self):
        for l in range(self.num_tasks):
            self._get_xxb(l, int(self.n[l]))

    def _solver_pure(self, raw, data=None):
        return _StandardSolver(self, raw, self.n)

    def _query_solver_any(self, raw, n):
        return _StandardSolver(self, raw, np.asarray(n, dtype=np.int64))

    def _on_data_change(self):
        self._solver_cache.clear()

    # -- Gaussian-kernel cubature (standard_gp.py:341-438) ---------------
    def _kint(self, n, task_sel):
        """Integrated cross-covariances sum_l S[task, l] k_int_l, (..., T, sum n)."""
        assert self.kernel_class == "gaussian", (
            "closed-form cubature is available for the Gaussian kernel only")
        kmat_tasks = self.gram_matrix_tasks
        scale, ls = self.scale, self.lengthscales
        pieces = []
        for l in range(self.num_tasks):
            x = self.get_x(l, n=int(n[l]))  # (n_l, d)
            lsb = ls[..., None, :]
            sig = jnp.sqrt(lsb)
            z1 = (1.0 - x) / sig
            z0 = (0.0 - x) / sig
            cdf_diff = jax.scipy.stats.norm.cdf(z1) - jax.scipy.stats.norm.cdf(z0)
            part = scale * (jnp.sqrt(2 * jnp.pi * lsb) * cdf_diff).prod(-1)  # (..., n_l)
            pieces.append(kmat_tasks[..., task_sel, l, None] * part[..., None, :])
        return jnp.concatenate(pieces, -1)

    def post_cubature_mean(self, task=None):
        """Posterior cubature mean via Normal-CDF integrals (standard_gp.py:341-360)."""
        coeffs = self.coeffs
        if task is None:
            task = self.default_task
        task, inttask = _as_task_array(task, self.num_tasks)
        kints = self._kint(self.n, task)
        pcmean = (kints * coeffs[..., None, :]).sum(-1)
        return pcmean[..., 0] if inttask else pcmean

    def _tprod(self):
        ls = self.lengthscales + jnp.zeros(self.d, dtype=self.dtype)
        t = 2 * (-1 + jnp.exp(-1 / (2 * ls))) * ls + jnp.sqrt(2 * jnp.pi * ls) * jax.lax.erf(
            1 / jnp.sqrt(2 * ls))
        return t.prod(-1)

    def post_cubature_var(self, task=None, n=None):
        """Posterior cubature variance (standard_gp.py:361-390)."""
        n = self._norm_n(n)
        solver = self._solver(n)
        kmat_tasks = self.gram_matrix_tasks
        if task is None:
            task = self.default_task
        task, inttask = _as_task_array(task, self.num_tasks)
        kints = self._kint(n, task)
        v = solver.gram_matrix_solve(kints, extra_ndim=1)
        tval = self.scale * kmat_tasks[..., task, task] * self._tprod()[..., None]
        pcvar = jnp.maximum(tval - (kints * v).sum(-1), 0.0)
        return pcvar[..., 0] if inttask else pcvar

    def post_cubature_cov(self, task0=None, task1=None, n=None):
        """Posterior cubature covariance (standard_gp.py:391-438)."""
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
        kints0 = self._kint(n, task0)
        kints1 = self._kint(n, task1)
        v = solver.gram_matrix_solve(kints1, extra_ndim=1)
        tval = self.scale[..., None] * kmat_tasks[..., task0, :][..., :, task1] * \
            self._tprod()[..., None, None]
        pccov = tval - jnp.einsum("...ai,...bi->...ab", kints0, v)
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
