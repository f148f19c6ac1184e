"""Base-2 digital nets (Sobol') in natural order with digital-shift / LMS
randomizations.

Point i has t-bit coordinates ``xb_i = XOR_{set bits k of i} C[:, k]`` where C
are the generating-matrix columns (Joe–Kuo direction numbers, shipped in
``points/data/sobol_directions_t30.npy`` — public mathematical constants
extracted from torch.quasirandom's table).  Natural order makes the
digitally-shift-invariant Gram matrix a group matrix over (Z_2)^m,
diagonalized by the FWHT (reference behavior: qmcpy.DigitalNetB2 with
order="NATURAL", return_binary=True, used at fast_gp_digital_net_b2.py:266-269).

Randomizations (reference constraints at fast_gp_digital_net_b2.py:219-221):
* "DS"      — XOR each coordinate with a random t-bit digital shift.
* "LMS"     — left-multiply generating matrices by a random lower-triangular
              unit-diagonal GF(2) matrix (per coordinate).
* "LMS_DS"  — both.  "FALSE" — none.
"""

import os

import numpy as np

_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")
_DIRECTIONS_FILE = os.path.join(_DATA_DIR, "sobol_directions_t30.npy")

_T = 30  # bits of precision in the packaged direction numbers
_directions_cache = None


def _load_directions() -> np.ndarray:
    global _directions_cache
    if _directions_cache is None:
        _directions_cache = np.load(_DIRECTIONS_FILE)  # (d_max, m_max) uint32
    return _directions_cache


def _lms_scramble(columns: np.ndarray, rng, t: int) -> np.ndarray:
    """Apply a random lower-triangular unit-diagonal GF(2) left-scramble.

    ``columns``: (d, m_max) uint32 generating-matrix columns (MSB = bit t-1).
    New column bits: row r of S (t x t, rows below diagonal random) dotted
    with the column's bit vector mod 2.
    """
    d, m_max = columns.shape
    out = np.zeros_like(columns)
    for j in range(d):
        # random lower-triangular rows as bit masks; row r has bits r..t-1
        # (acting on MSB-first bit index), diagonal forced to 1
        rows = rng.integers(0, 1 << t, size=t, dtype=np.uint64)
        for r in range(t):
            keep_mask = (1 << (t - r)) - 1  # bits at positions <= t-1-r (LSB side)
            row = (rows[r] & keep_mask) | (1 << (t - 1 - r))
            col_bits = columns[j].astype(np.uint64)
            parity = col_bits & row
            # popcount parity per element
            p = parity
            count = np.zeros_like(p)
            while True:
                count ^= p & 1
                p >>= 1
                if not p.any():
                    break
            out[j] |= (count.astype(out.dtype) << np.asarray(t - 1 - r, dtype=out.dtype)).astype(out.dtype)
    return out


class DigitalNetB2:
    """Sobol' base-2 digital net sequence (natural order).

    Args:
        dimension: number of coordinates (<= packaged table size).
        seed: PRNG seed for the randomization.
        randomize: one of "DS", "LMS", "LMS_DS", "FALSE".
        t: output bit precision in [30, 53] (default 30, the table's native
            precision).  For t > 30 the generating-matrix columns are
            left-shifted (the Sobol' matrices are upper-triangular, so rows
            beyond the table's 30 carry information only through the digital
            shift / LMS randomization — same semantics as the reference's
            t < 64, fast_gp_digital_net_b2.py:223).  53 keeps the float form
            exact in float64.
    """

    order = "NATURAL"
    replications = 1

    def __init__(self, dimension, seed=None, randomize="DS", t=_T):
        self.d = int(dimension)
        table = _load_directions()
        assert 1 <= self.d <= table.shape[0], f"dimension must be <= {table.shape[0]}"
        randomize = str(randomize).upper()
        assert randomize in ("DS", "LMS", "LMS_DS", "FALSE"), randomize
        self.randomize = randomize
        assert _T <= t <= 53, "t must be in [30, 53]"
        self.t = int(t)
        self.m_max = table.shape[1]
        rng = np.random.default_rng(seed)
        if self.t == _T:
            cols = table[: self.d].copy()  # (d, m_max) uint32
        else:
            cols = table[: self.d].astype(np.uint64) << (self.t - _T)
        if "LMS" in randomize:
            cols = _lms_scramble(cols, rng, self.t)
        self.columns = cols
        idtype = np.uint32 if self.t == _T else np.uint64
        if "DS" in randomize:
            self.shift = rng.integers(0, 1 << self.t, size=self.d,
                                      dtype=np.uint64).astype(idtype)
        else:
            self.shift = np.zeros(self.d, dtype=idtype)
        # incrementally grown natural-order unshifted net (doubling construction)
        self._xb = np.zeros((1, self.d), dtype=idtype)

    def _grow(self, n: int):
        while self._xb.shape[0] < n:
            k = self._xb.shape[0].bit_length() - 1  # current size 2^k
            self._xb = np.concatenate([self._xb, self._xb ^ self.columns[:, k][None, :]], axis=0)

    def __call__(self, n_min: int, n_max: int, return_binary: bool = False):
        """Points with indices in [n_min, n_max); float in [0,1) or t-bit ints."""
        assert 0 <= n_min <= n_max <= (1 << self.m_max)
        from . import native
        if self.t == _T:
            xb = native.sobol_natural(self.columns, int(n_min), int(n_max), self.shift)
        else:
            xb = native.sobol_natural64(self.columns, int(n_min), int(n_max), self.shift)
        if xb is None:
            self._grow(n_max)
            xb = self._xb[n_min:n_max] ^ self.shift[None, :]
        if return_binary:
            return xb
        return xb.astype(np.float64) * 2.0**-self.t
