"""TPU-native fast Gaussian processes: O(n log n) GP regression on
low-discrepancy point sets, built on JAX/XLA/Pallas.

Capability parity target: alegresor/FastGaussianProcesses (fastgps).
"""

from . import config  # noqa: F401  (enables x64, must come first)
from .models.digital_gp import FastGPDigitalNetB2
from .models.lattice_gp import FastGPLattice
from .points.digital_net import DigitalNetB2
from .points.halton import Halton
from .points.lattice import LatticeSeq

__all__ = [
    "FastGPLattice",
    "FastGPDigitalNetB2",
    "StandardGP",
    "LatticeSeq",
    "DigitalNetB2",
    "Halton",
    "__version__",
]

__version__ = "0.1.0"


def __getattr__(name):
    if name == "StandardGP":
        from .models.standard_gp import StandardGP
        return StandardGP
    raise AttributeError(name)
