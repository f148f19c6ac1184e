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


def measure_hmc_scaling(model, num_chains=8, device_counts=None,
                        num_samples=100, num_warmup=100, seed=0):
    """Measure chain-sharded HMC throughput across device counts.

    Protocol: a FIXED total number of chains is sharded over k devices for
    each k in ``device_counts``; samples/s is wall-clocked with a host fetch
    as the sync point.  The HMC chains are embarrassingly parallel (the only
    cross-chain traffic is the scalar dual-averaging/mass psum), so on real
    multi-chip hardware samples/s should be flat in k — the reported
    ``efficiency`` = samples_per_s[k_max] / samples_per_s[1] measures the
    partitioning + collective overhead that would erode the BASELINE.json
    north-star >= 0.8 multi-host scaling.  (On a virtual CPU mesh the
    physical compute is shared, so flat throughput is also the ideal.)

    Returns {"samples_per_s": {k: float}, "efficiency": float}.
    """
    import time

    from ..fit.hmc import sample_gp_hyperposterior
    from .mesh import batch_sharding, make_mesh

    if device_counts is None:
        device_counts = (1, len(jax.devices()))
    results = {}
    for k in device_counts:
        assert num_chains % k == 0, (num_chains, k)
        mesh = make_mesh({"chains": k}, devices=jax.devices()[:k])
        sharding = batch_sharding(mesh, "chains") if k > 1 else None
        with mesh:
            # identical-config warmup run: the scan length is static, so only
            # a same-shape run precompiles the timed executable
            res, _ = sample_gp_hyperposterior(
                model, num_samples=num_samples, num_warmup=num_warmup,
                num_chains=num_chains, seed=seed, chain_sharding=sharding)
            np.asarray(res.log_prob)
            t0 = time.perf_counter()
            res, _ = sample_gp_hyperposterior(
                model, num_samples=num_samples, num_warmup=num_warmup,
                num_chains=num_chains, seed=seed, chain_sharding=sharding)
            np.asarray(res.log_prob)  # host fetch = true sync
        results[k] = num_samples * num_chains / (time.perf_counter() - t0)
    ks = sorted(results)
    return {"samples_per_s": results,
            "efficiency": float(results[ks[-1]] / results[ks[0]])}
