"""TPU-native fast Gaussian processes: O(n log n) GP regression on
low-discrepancy point sets, built on JAX/XLA/Pallas.

Capability parity target: alegresor/FastGaussianProcesses (fastgps).
"""

from . import config  # noqa: F401  (enables x64, must come first)

__version__ = "0.1.0"
