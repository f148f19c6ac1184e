"""Test shim: dense oracle now lives in the package (utils.debug)."""

from fastgaussianprocesses_tpu.utils.debug import dense_gram  # noqa: F401
