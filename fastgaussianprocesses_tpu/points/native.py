"""ctypes loader for the native C++ point-generation library.

Compiles points/_native/fastgp_native.cpp on first use (g++, cached as a
shared object next to the source) and exposes typed wrappers.  Falls back to
``None`` when no compiler is available — callers must keep their numpy
paths.  Disable with FASTGPS_TPU_NO_NATIVE=1.
"""

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "_native")
_SRC = os.path.join(_DIR, "fastgp_native.cpp")
_SO = os.path.join(_DIR, "libfastgp_native.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("FASTGPS_TPU_NO_NATIVE", "0") == "1":
        return None
    try:
        if (not os.path.exists(_SO)) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(_SO)
        lib.sobol_natural.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int, ctypes.c_int,
            ctypes.c_uint64, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32)]
        lib.sobol_natural64.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_int, ctypes.c_int,
            ctypes.c_uint64, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64)]
        lib.lattice_natural.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_int,
            ctypes.c_uint64, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double)]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def sobol_natural(cols: np.ndarray, n_min: int, n_max: int, shift: np.ndarray):
    """Natural-order Sobol' block via the native library, or None."""
    lib = _load()
    if lib is None:
        return None
    cols = np.ascontiguousarray(cols, dtype=np.uint32)
    shift = np.ascontiguousarray(shift, dtype=np.uint32)
    d, m_max = cols.shape
    out = np.empty((n_max - n_min, d), dtype=np.uint32)
    lib.sobol_natural(
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), d, m_max,
        n_min, n_max,
        shift.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    return out


def sobol_natural64(cols: np.ndarray, n_min: int, n_max: int, shift: np.ndarray):
    """uint64 natural-order Sobol' block (t > 30 bits) via the native library."""
    lib = _load()
    if lib is None or not hasattr(lib, "sobol_natural64"):
        return None
    cols = np.ascontiguousarray(cols, dtype=np.uint64)
    shift = np.ascontiguousarray(shift, dtype=np.uint64)
    d, m_max = cols.shape
    out = np.empty((n_max - n_min, d), dtype=np.uint64)
    lib.sobol_natural64(
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), d, m_max,
        n_min, n_max,
        shift.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    return out


def lattice_natural(gen_vec: np.ndarray, n_min: int, n_max: int, shift: np.ndarray):
    """Natural-order lattice block via the native library, or None."""
    lib = _load()
    if lib is None:
        return None
    gen_vec = np.ascontiguousarray(gen_vec, dtype=np.uint64)
    shift = np.ascontiguousarray(shift, dtype=np.float64)
    d = gen_vec.shape[0]
    out = np.empty((n_max - n_min, d), dtype=np.float64)
    lib.lattice_natural(
        gen_vec.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), d,
        n_min, n_max,
        shift.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out
