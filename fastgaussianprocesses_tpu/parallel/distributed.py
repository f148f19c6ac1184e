"""Multi-host bring-up helpers.

The reference is single-process (SURVEY.md section 2.4); scaling beyond one
host uses ``jax.distributed.initialize`` plus a process-spanning mesh: ICI
collectives within a slice, DCN across hosts — all emitted by GSPMD from the
same NamedShardings used single-host (parallel/mesh.py).
"""

import jax
import numpy as np


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize multi-host JAX (no-op when single-process env vars absent).

    On Cloud TPU pods the arguments are auto-detected; pass them explicitly
    for manual launches.
    """
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except Exception:
        if num_processes not in (None, 1):
            raise


def global_mesh(axis_sizes: dict):
    """Mesh over ALL processes' devices ({axis: size}, -1 = remaining)."""
    from .mesh import make_mesh

    return make_mesh(axis_sizes, devices=jax.devices())


def process_local_batch(global_batch: int) -> slice:
    """The slice of a leading global batch axis owned by this process."""
    nproc = jax.process_count()
    assert global_batch % nproc == 0
    per = global_batch // nproc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def hmc_scaling_efficiency(samples_per_sec: dict) -> float:
    """Scaling efficiency from {num_devices: samples/s} measurements."""
    ks = sorted(samples_per_sec)
    base = samples_per_sec[ks[0]] / ks[0]
    top = samples_per_sec[ks[-1]] / ks[-1]
    return float(top / base)
