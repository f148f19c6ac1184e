"""Fast Gaussian process regression with rank-1 lattice points and
shift-invariant (Bernoulli-polynomial series) kernels.

O(n log n) train/posterior via the orthonormal bit-reversed FFT.
API parity target: fastgps.FastGPLattice (fast_gp_lattice.py:7-273).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels import series
from ..ops import transforms as tr
from ..ops.bernoulli import MAX_ORDER
from ..points.lattice import LatticeSeq
from .fast import AbstractFastGP


class FastGPLattice(AbstractFastGP):
    r"""Shift-invariant-kernel GP on randomly-shifted rank-1 lattices.

    Args (mirroring fast_gp_lattice.py:125-158):
        seqs: a LatticeSeq, list of LatticeSeq (one per task), or an int
            dimension (sequences are then created with per-task seeds
            spawned from ``seed_for_seq``).
        num_tasks, seed_for_seq, alpha, scale, lengthscales, noise,
        factor_task_kernel, rank_factor_task_kernel, noise_task_kernel,
        tfs_*, requires_grad_*, shape_*, derivatives, derivatives_coeffs,
        adaptive_nugget: see AbstractGP.
        dtype: compute dtype (float64 default on CPU, float32 on TPU).

    Worked example (doctest-run by tests/test_doctests.py on CPU float64;
    mirrors the reference's executable docstring, fast_gp_lattice.py:11-121):

    >>> import numpy as np, jax.numpy as jnp
    >>> gp = FastGPLattice(2, seed_for_seq=7, alpha=2)
    >>> x = gp.get_x_next(64)
    >>> y = jnp.sin(2*jnp.pi*x[:, 0]) * jnp.cos(2*jnp.pi*x[:, 1]) + x.sum(1)
    >>> gp.add_y_next(y)
    >>> data = gp.fit(iterations=40, verbose=0)
    >>> data['iterations']
    33
    >>> xq = np.array([[0.1, 0.2], [0.5, 0.5], [0.9, 0.8]])
    >>> pm, pv = gp.post_mean_var(xq)
    >>> [round(float(v), 4) for v in pm]
    [0.416, 0.9556, 1.4521]
    >>> [round(float(v), 6) for v in pv]
    [0.004823, 0.008514, 0.007165]
    >>> round(float(gp.post_cubature_mean()), 4)
    0.9915
    >>> pmean, pvar, q, lo, hi = gp.post_ci(xq)
    >>> [round(float(v), 3) for v in lo]
    [-0.045, 0.343, 0.891]

    Posterior-variance projections at a FUTURE n equal the values after
    actually ingesting those points (reference fast_gp_lattice.py:95-97):

    >>> pv_future = gp.post_var(xq, n=128)
    >>> xn = gp.get_x_next(128)
    >>> yn = jnp.sin(2*jnp.pi*xn[:, 0]) * jnp.cos(2*jnp.pi*xn[:, 1]) + xn.sum(1)
    >>> gp.add_y_next(yn)
    >>> bool(np.allclose(np.asarray(gp.post_var(xq)), np.asarray(pv_future)))
    True
    """

    def __init__(self, seqs, num_tasks=None, seed_for_seq=None, alpha=2,
                 noise=1e-8, **kwargs):
        nt = 1 if num_tasks is None else num_tasks
        if isinstance(seqs, int):
            seeds = np.random.SeedSequence(seed_for_seq).spawn(nt)
            seqs = [LatticeSeq(seqs, seed=s, randomize="SHIFT") for s in seeds]
        if isinstance(seqs, LatticeSeq):
            seqs = [seqs]
        assert all(isinstance(s, LatticeSeq) for s in seqs)
        assert all(s.order == "NATURAL" for s in seqs)
        assert all(s.randomize in ("FALSE", "SHIFT") for s in seqs)
        a = np.asarray(alpha)
        assert ((1 <= a) & (2 * a <= MAX_ORDER)).all(), "alpha must be in [1, 4]"
        super().__init__(alpha, seqs, num_tasks=num_tasks, noise=noise, **kwargs)
        self._k1parts_br_cache = {}

    def _ftout_dtype(self):
        return jnp.complex128 if self.dtype == jnp.float64 else jnp.complex64

    def _ft(self, x):
        if self._seq_mesh is not None:
            from ..parallel import mesh as pm
            return tr._stabilize(
                lambda v: pm.sharded_fftbr(v, self._seq_mesh, self._seq_axis), x)
        return tr.ft_stable_lattice(x)

    def _ift(self, x):
        if self._seq_mesh is not None:
            from ..parallel import mesh as pm
            return tr._stabilize(
                lambda v: pm.sharded_ifftbr(v, self._seq_mesh, self._seq_axis), x)
        return tr.ift_stable_lattice(x)

    def _ominus(self, a, b):
        return series.lattice_ominus(a, b)

    def _parts_from_delta(self, delta, beta, kappa):
        return series.si_parts_from_delta(delta, self.alpha, beta, kappa)

    def _part_dim(self, delta_j, j, b, k):
        return series.si_part_dim(delta_j, int(self.alpha[j]), b, k)

    def get_omega(self, m):
        return tr.get_omega_lattice(m, dtype=self._ftout_dtype())

    _char_kind = "fourier"

    def _get_k1parts_lam(self, l0, l1, n):
        """Bit-reverse-permuted first-column parts in TPU layout (p0,p1,d,n).

        Permuting the hyperparameter-free parts once lets ``_ft_lam`` be a
        plain FFT: the O(n) gather (and its scatter transpose in the
        backward pass) disappears from every fit step.  The point axis goes
        LAST so the per-step contraction fills vector lanes
        (series.kernel_from_parts_t).
        """
        if self._seq_mesh is not None:
            # sequence-sharded path keeps the NATURAL-order layout and lets
            # sharded_fftbr fold the bit reversal into its index maps
            return super()._get_k1parts_lam(l0, l1, n)
        key = (l0, l1, int(n))
        cached = self._k1parts_br_cache.get(key)
        if cached is None:
            from ..ops.bitops import bit_reverse_permutation, log2_int
            parts = self._get_k1parts(l0, l1, n)
            perm = bit_reverse_permutation(log2_int(int(n)))
            cached = jnp.take(jnp.moveaxis(parts, 0, -1),
                              jnp.asarray(perm.astype(np.int32)), axis=-1)
            cached = jax.device_put(cached)
            self._k1parts_br_cache[key] = cached
            if len(self._k1parts_br_cache) > 24:
                self._k1parts_br_cache.pop(next(iter(self._k1parts_br_cache)))
        return cached

    def _ft_lam(self, k1):
        """Mean-centered plain orthonormal FFT (input already bit-reversed);
        under sequence sharding the input is natural-order and the sharded
        bit-reversed FFT applies directly."""
        if self._seq_mesh is not None:
            return self._ft(k1)
        return tr.ft_stable_plain_fft(k1)

    # half-spectrum (rfft) hooks: k1 and y are real, so the single-task
    # solver runs on the Hermitian half spectrum (models/fast.py
    # _HalfSpectrumSolver) — ~2x on the FFT passes that dominate the step
    def _ft_lam_half(self, k1):
        return tr.rfft_stable_plain(k1)

    def _ft_half(self, v):
        return tr.rfft_stable_lattice(v)

    def _ift_half(self, z_half, n):
        return tr.irfft_br(z_half, n)

    # permuted-spectrum (Pallas VMEM-fused FFT) hooks: same bit-reversed
    # input vector space as the plain-FFT path, spectrum in the kernel's
    # fixed permuted bin order (ops/pallas_fft) — selected on TPU f32 by
    # models/fast._use_perm_spectrum
    def _ft_lam_perm(self, k1):
        return tr.pfft_stable(k1)

    def _ft_perm(self, v):
        """Model-order (natural) input: bit-reverse, then stabilized pfft."""
        from ..ops.bitops import bit_reverse_permutation, log2_int
        n = v.shape[-1]
        perm = jnp.asarray(bit_reverse_permutation(log2_int(n)).astype(np.int32))
        return tr.pfft_stable(jnp.take(v, perm, axis=-1))

    def _ift_perm_coeffs(self, z, n):
        """Inverse to natural point order (the coeffs convention): perm
        inverse gives the bit-reversed-order vector; un-reverse it."""
        from ..ops.bitops import bit_reverse_permutation, log2_int
        perm = jnp.asarray(bit_reverse_permutation(log2_int(n)).astype(np.int32))
        return jnp.take(tr.pifft_ortho_real(z, n), perm, axis=-1)

    def _ft_perm_q(self, v, pre_permuted=False):
        if pre_permuted:
            return tr.pfft_stable(v)
        return self._ft_perm(v)

    def _ift_perm_q(self, z, n, pre_permuted=False):
        out = tr.pifft_ortho_real(z, n)
        if pre_permuted:
            return out
        from ..ops.bitops import bit_reverse_permutation, log2_int
        perm = jnp.asarray(bit_reverse_permutation(log2_int(n)).astype(np.int32))
        return jnp.take(out, perm, axis=-1)

    # -- gather-free query transforms ------------------------------------
    # Cross-kernel queries feed the solver rows whose TRAINING columns are
    # already bit-reversed (_train_col_perm), so the per-chunk transform is
    # a plain (r)fft: jnp.take along a 2^20 axis costs multiples of the FFT
    # on TPU and dominated the round-3 lattice posterior query.
    def _train_col_perm(self, l, n):
        # All-or-nothing across tasks: n==1 gets the identity permutation
        # (bit_reverse_permutation(0)) so that a multitask model with one
        # tiny task still reports _query_pre_permuted == True for the other
        # tasks' bit-reversed columns (round-4 ADVICE: a n<2 guard here made
        # _cross_kmat permute large tasks while the solver assumed natural
        # order, silently corrupting multitask posteriors).
        if self._seq_mesh is not None:
            return None
        from ..ops.bitops import bit_reverse_permutation, log2_int
        if int(n) == 0:
            return np.arange(0, dtype=np.int64)
        return bit_reverse_permutation(log2_int(int(n)))

    def _ft_q(self, v, pre_permuted=False):
        if pre_permuted and self._seq_mesh is None:
            return tr.ft_stable_plain_fft(v)
        return self._ft(v)

    def _ift_q(self, v, pre_permuted=False):
        if pre_permuted and self._seq_mesh is None:
            return tr.ift_stable_plain(v)
        return self._ift(v)

    def _ft_half_q(self, v, pre_permuted=False):
        return tr.rfft_stable_plain(v) if pre_permuted else self._ft_half(v)

    def _ift_half_q(self, v, n, pre_permuted=False):
        return tr.irfft_plain(v, n) if pre_permuted else self._ift_half(v, n)

    def _point_class(self, task, n_l, r_l):
        """Class of point i for exact inverse diagonals: rho_m(i) mod r_l."""
        from ..ops.bitops import bit_reverse_permutation, log2_int
        return bit_reverse_permutation(log2_int(n_l))[:n_l] % r_l
