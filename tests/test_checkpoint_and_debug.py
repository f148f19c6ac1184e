"""Checkpoint round-trip and the FASTGPS_TPU_DEBUG oracle."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from fastgaussianprocesses_tpu import FastGPDigitalNetB2, FastGPLattice
from fastgaussianprocesses_tpu.utils.checkpoint import load_state, save_state


@pytest.mark.parametrize("model_cls", [FastGPLattice, FastGPDigitalNetB2])
def test_checkpoint_roundtrip(tmp_path, model_cls):
    fgp = model_cls(2, seed_for_seq=7)
    x = np.asarray(fgp.get_x_next(64))
    fgp.add_y_next(jnp.asarray(np.sin(2 * np.pi * x[:, 0])))
    fgp.fit(iterations=5, verbose=0)
    xq = np.random.default_rng(0).uniform(size=(9, 2))
    want_pm = np.asarray(fgp.post_mean(xq))
    want_pv = np.asarray(fgp.post_var(xq))
    path = str(tmp_path / "ckpt.npz")
    save_state(fgp, path)
    # different seed -> different randomization, then restore
    fresh = model_cls(2, seed_for_seq=999)
    load_state(fresh, path)
    np.testing.assert_allclose(np.asarray(fresh.post_mean(xq)), want_pm, atol=1e-10)
    np.testing.assert_allclose(np.asarray(fresh.post_var(xq)), want_pv, atol=1e-10)
    np.testing.assert_allclose(np.asarray(fresh.x), np.asarray(fgp.x), atol=0)
    # resumed model can continue the doubling protocol
    x2 = fresh.get_x_next(128)
    fresh.add_y_next(jnp.asarray(np.sin(2 * np.pi * np.asarray(x2)[:, 0])))
    assert fresh.n[0] == 128


def test_debug_oracle_runs(monkeypatch):
    monkeypatch.setenv("FASTGPS_TPU_DEBUG", "1")
    fgp = FastGPLattice(2, seed_for_seq=3, noise=1e-4)
    x = np.asarray(fgp.get_x_next(32))
    fgp.add_y_next(jnp.asarray(np.sin(2 * np.pi * x[:, 0])))
    _ = fgp.coeffs  # builds a solver -> triggers the dense cross-check
