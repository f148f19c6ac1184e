"""Bit-manipulation helpers shared by point generators and fast transforms."""

import functools

import numpy as np


@functools.lru_cache(maxsize=64)
def bit_reverse_permutation(m: int) -> np.ndarray:
    """Permutation ``rho`` with ``rho[i]`` = the m-bit reversal of ``i``.

    ``rho`` is an involution: ``rho[rho[i]] == i``.  Used to relate the
    natural (van der Corput) ordering of extensible lattices to the cyclic
    group ordering in which their Gram matrices are circulant (reference
    behavior: qmcpy ``fftbr_torch`` consumed at fast_gp_lattice.py:224).
    """
    assert 0 <= m <= 30
    n = 1 << m
    i = np.arange(n, dtype=np.uint32)
    r = np.zeros(n, dtype=np.uint32)
    for b in range(m):
        r |= ((i >> b) & 1) << (m - 1 - b)
    return r.astype(np.int64)


@functools.lru_cache(maxsize=64)
def van_der_corput_f64(m: int) -> np.ndarray:
    """First 2^m van der Corput points in base 2: vdc(i) = bitrev_m(i)/2^m.

    Exact in float64 for m <= 52.  The sequence is *nested*: the first 2^k
    entries equal ``van_der_corput_f64(k)`` for every k <= m.
    """
    return bit_reverse_permutation(m).astype(np.float64) / float(1 << m)


def log2_int(n: int) -> int:
    m = int(n).bit_length() - 1
    assert n == (1 << m), f"n={n} must be a power of two"
    return m
