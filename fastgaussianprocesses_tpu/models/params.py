"""Hyperparameter specification: shapes, transform pairs, trainability.

Mirrors the reference's parameter system (abstract_gp.py:78-139): each
hyperparameter has a value shape whose leading dims must be a suffix of
``shape_batch``, a (to_raw, from_raw) transform pair (default log/exp for
positive parameters), and a requires-grad flag consumed by the Rprop mask.
"""

import math
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

LOG_EXP = (jnp.log, jnp.exp)
IDENTITY = (lambda x: x, lambda x: x)


class Param(NamedTuple):
    raw: jnp.ndarray
    from_raw: Callable
    trainable: bool

    @property
    def value(self):
        return self.from_raw(self.raw)


def _check_batch_suffix(shape: Tuple[int, ...], shape_batch: Tuple[int, ...], ndim_value: int, name: str):
    lead = shape[:len(shape) - ndim_value]
    if lead:
        assert tuple(lead) == tuple(shape_batch[len(shape_batch) - len(lead):]), (
            f"{name}: leading dims {lead} must be a suffix of shape_batch {shape_batch}")


def make_param(name: str, value, default_shape, tfs, trainable: bool,
               shape_batch, ndim_value: int, dtype, positive: bool = True,
               allow_nonneg: bool = False) -> Param:
    """Validate and build a parameter following the reference shape rules.

    All init math runs host-side (numpy, or the CPU backend for custom
    transform callables): on TPU, every tiny eager op would otherwise go
    through the remote-compile relay and cost ~0.5 s each.
    """
    if np.isscalar(value):
        shape = tuple(default_shape)
        np_value = np.full(shape, float(value), dtype=np.float64)
    else:
        np_value = np.asarray(value, dtype=np.float64)
        shape = np_value.shape
    _check_batch_suffix(shape, tuple(shape_batch), ndim_value, name)
    if positive:
        if allow_nonneg:
            assert (np_value >= 0).all(), f"{name} must be non-negative"
        else:
            assert (np_value > 0).all(), f"{name} must be positive"
    to_raw, from_raw = tfs
    assert callable(to_raw) and callable(from_raw), f"tfs_{name} must be a pair of callables"
    if to_raw is jnp.log:
        raw_np = np.log(np_value)
    else:
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            raw_np = np.asarray(to_raw(jnp.asarray(np_value)))
    return Param(raw=jnp.asarray(raw_np, dtype=dtype), from_raw=from_raw,
                 trainable=bool(trainable))


MLL_LOG_2PI = math.log(2.0 * math.pi)
