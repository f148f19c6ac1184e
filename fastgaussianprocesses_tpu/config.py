"""Global configuration for the TPU-native fast-GP framework.

The reference implementation (fastgps, /root/reference/fastgps/abstract_gp.py:46)
mandates float64 because its fast transforms are numerically sensitive.  On TPU,
float64 is software-emulated and slow, so this framework is dtype-polymorphic:

* x64 support is enabled in JAX at import so CPU runs (tests, goldens) can use
  exact float64 semantics.
* Each model takes a ``dtype`` argument.  The default is float64 on CPU backends
  and float32 on TPU, where the mean-centered transforms (see ops/stability)
  keep the O(n log n) path accurate enough at bench scale.

Set ``FASTGPS_TPU_NO_X64=1`` before import to skip enabling x64 (e.g. when
embedding into an application that requires 32-bit JAX defaults).
"""

import os

import jax

if os.environ.get("FASTGPS_TPU_NO_X64", "0") != "1":
    jax.config.update("jax_enable_x64", True)

# TPU matmuls default to bfloat16 operand rounding; the FWHT's Hadamard
# contractions (and solver einsums) need true float32 — the +-1 matrices are
# exact, it is the DATA that must not be rounded to 8-bit mantissas.
# Override with FASTGPS_TPU_MATMUL_PRECISION=default for max raw throughput.
_prec = os.environ.get("FASTGPS_TPU_MATMUL_PRECISION", "highest")
if _prec != "default":
    jax.config.update("jax_default_matmul_precision", _prec)


def default_dtype():
    """float64 on CPU backends, float32 on accelerators (TPU/GPU)."""
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        return jnp.float64
    return jnp.float32


def debug_checks_enabled() -> bool:
    """Mirror of the reference's FASTGP_DEBUG oracle flag (util.py:127,324).

    When true, fast paths are cross-checked against dense recomputations in
    the host-side wrappers (outside jit).
    """
    return os.environ.get("FASTGPS_TPU_DEBUG", "") in ("1", "True", "true")
