"""Fast Gaussian process regression with base-2 digital nets (Sobol') and
digitally-shift-invariant (weighted-Walsh series) kernels.

O(n log n) train/posterior via the orthonormal fast Walsh–Hadamard
transform.  API parity target: fastgps.FastGPDigitalNetB2
(fast_gp_digital_net_b2.py:7-301).
"""

import numpy as np
import jax.numpy as jnp

from ..kernels import series
from ..ops import transforms as tr
from ..points.digital_net import DigitalNetB2
from .fast import AbstractFastGP


class FastGPDigitalNetB2(AbstractFastGP):
    r"""DSI-kernel GP on digitally-shifted Sobol' nets.

    Args mirror fast_gp_digital_net_b2.py:117-160; see FastGPLattice.

    Worked example (doctest-run by tests/test_doctests.py on CPU float64;
    mirrors the reference's executable docstring,
    fast_gp_digital_net_b2.py:11-116):

    >>> import numpy as np, jax.numpy as jnp
    >>> gp = FastGPDigitalNetB2(2, seed_for_seq=7, alpha=2)
    >>> x = gp.get_x_next(64)
    >>> y = jnp.sin(2*jnp.pi*x[:, 0]) * jnp.cos(2*jnp.pi*x[:, 1]) + x.sum(1)
    >>> gp.add_y_next(y)
    >>> data = gp.fit(iterations=40, verbose=0)
    >>> data['iterations']
    33
    >>> xq = np.array([[0.1, 0.2], [0.5, 0.5], [0.9, 0.8]])
    >>> pm, pv = gp.post_mean_var(xq)
    >>> [round(float(v), 4) for v in pm]
    [0.513, 1.8084, 1.637]
    >>> [round(float(v), 6) for v in pv]
    [0.012298, 0.0546, 0.072452]
    >>> round(float(gp.post_cubature_mean()), 4)
    1.0083
    >>> pv_future = gp.post_var(xq, n=128)
    >>> xn = gp.get_x_next(128)
    >>> yn = jnp.sin(2*jnp.pi*xn[:, 0]) * jnp.cos(2*jnp.pi*xn[:, 1]) + xn.sum(1)
    >>> gp.add_y_next(yn)
    >>> bool(np.allclose(np.asarray(gp.post_var(xq)), np.asarray(pv_future)))
    True
    """

    def __init__(self, seqs, num_tasks=None, seed_for_seq=None, alpha=2,
                 noise=1e-16, **kwargs):
        nt = 1 if num_tasks is None else num_tasks
        if isinstance(seqs, int):
            seeds = np.random.SeedSequence(seed_for_seq).spawn(nt)
            seqs = [DigitalNetB2(seqs, seed=s, randomize="DS") for s in seeds]
        if isinstance(seqs, DigitalNetB2):
            seqs = [seqs]
        assert all(isinstance(s, DigitalNetB2) for s in seqs)
        assert all(s.order == "NATURAL" for s in seqs)
        if nt == 1:
            assert seqs[0].randomize in ("FALSE", "DS", "LMS", "LMS_DS")
        else:
            # cross-task diagonalization needs a shared base net: only digital
            # shifts may differ between tasks (fast_gp_digital_net_b2.py:219-221)
            assert all(s.randomize in ("FALSE", "DS") for s in seqs)
        ts = {s.t for s in seqs}
        assert len(ts) == 1, "all sequences must share the same t"
        self.t = seqs[0].t
        assert self.t < 64
        a = np.asarray(alpha)
        assert ((1 <= a) & (a <= 4)).all(), "alpha must be in [1, 4]"
        super().__init__(alpha, seqs, num_tasks=num_tasks, noise=noise, **kwargs)
        if self._has_derivatives and any((dv > 0).any() for dv in self.derivatives):
            assert (self.alpha >= 2).all(), "derivatives require alpha >= 2"

    def _ftout_dtype(self):
        return self.dtype

    def _ft(self, x):
        if self._seq_mesh is not None:
            from ..parallel import mesh as pm
            return tr._stabilize(
                lambda v: pm.sharded_fwht(v, self._seq_mesh, self._seq_axis), x)
        return tr.ft_stable_fwht(x)

    _ift = _ft  # FWHT is self-inverse (dispatch inside covers both paths)

    @property
    def _xb_int_dtype(self):
        # int32 halves the integer memory traffic of kernel evaluations and
        # is exact for t <= 30 bits (values < 2^30)
        return np.int32 if self.t <= 30 else np.int64

    def _sample(self, seq, n_min, n_max):
        xb = seq(n_min, n_max, return_binary=True).astype(self._xb_int_dtype)
        return xb * 2.0 ** -self.t, xb

    def _convert_to_b(self, x):
        """t-bit fixed-point form of float points (fast_gp_digital_net_b2.py:270)."""
        out_dtype = jnp.int32 if self.t <= 30 else jnp.int64
        return jnp.floor((x % 1.0) * (2 ** self.t)).astype(out_dtype)

    def _ominus(self, a, b):
        a_int = jnp.issubdtype(a.dtype, jnp.integer)
        b_int = jnp.issubdtype(b.dtype, jnp.integer)
        ab = a if a_int else self._convert_to_b(a)
        bb = b if b_int else self._convert_to_b(b)
        return ab ^ bb

    def _parts_from_delta(self, delta, beta, kappa):
        return series.dsi_parts_from_delta(delta, self.t, self.alpha, beta, kappa,
                                           dtype=self.dtype)

    def _part_dim(self, delta_j, j, b, k):
        return series.dsi_part_dim(delta_j, self.t, int(self.alpha[j]), b, k,
                                   dtype=self.dtype)

    def _part_dim_pair(self, xj, zj, j, b, k):
        """Side-wise series term: bit-spread feature maps are computed once
        per side (they commute with the XOR group op), so the O(N*n) inner
        loop of cross-kernel queries pays only one XOR + convert per chunk
        (ops/walsh_closed.omega_walsh_closed_pair)."""
        from ..ops.walsh_closed import omega_walsh_closed_pair
        import jax.numpy as jnp

        xb = xj if jnp.issubdtype(xj.dtype, jnp.integer) else self._convert_to_b(xj)
        zb = zj if jnp.issubdtype(zj.dtype, jnp.integer) else self._convert_to_b(zj)
        bpk = b + k
        order = int(self.alpha[j]) - bpk
        assert 1 <= order <= 4, order
        om = omega_walsh_closed_pair(xb, zb, self.t, order, dtype=self.dtype)
        ind = 1.0 if bpk > 0 else 0.0
        return float((-2.0) ** bpk) * (ind + om)

    def get_omega(self, m):
        return 1.0

    _char_kind = "walsh"

    def _point_class(self, task, n_l, r_l):
        """Class of point i for exact inverse diagonals: top log2(r_l) bits."""
        import numpy as np
        from ..ops.bitops import log2_int
        m_min = log2_int(n_l) - log2_int(r_l)
        return np.arange(n_l) >> m_min
