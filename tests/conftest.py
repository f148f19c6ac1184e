"""Test configuration: force an 8-virtual-device CPU mesh with x64 enabled.

The environment's sitecustomize registers a TPU (axon) PJRT plugin and sets
``jax_platforms="axon,cpu"`` programmatically, so the JAX_PLATFORMS env var
alone is not enough — we override the config knob before any backend
initializes.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
