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


def test_incremental_doubling_butterfly():
    """add_y_next at n -> 2n reuses the cached half-size ytilde via the
    radix-2 merge: only a HALF-size transform runs, and the result matches
    the full recompute (reference util.py:173-183)."""
    import numpy as np
    import jax.numpy as jnp
    from fastgaussianprocesses_tpu import FastGPDigitalNetB2, FastGPLattice

    def f(x):
        return np.sin(2 * np.pi * x[:, 0]) + x.sum(1)

    for cls in (FastGPLattice, FastGPDigitalNetB2):
        fgp = cls(2, seed_for_seq=7, alpha=2)
        x = fgp.get_x_next(64)
        fgp.add_y_next(jnp.asarray(f(np.asarray(x))))
        yt64 = fgp._get_ytilde(0, 64)
        # doubling: record transform calls to prove only the half runs
        calls = []
        orig = fgp._ft_jit
        fgp._ft_jit = lambda v: (calls.append(v.shape[-1]) or orig(v))
        x2 = fgp.get_x_next(128)
        fgp.add_y_next(jnp.asarray(f(np.asarray(x2))))
        assert (0, 64) in fgp._ytilde_cache  # prefix cache survives ingestion
        yt128 = fgp._get_ytilde(0, 128)
        assert calls == [64], calls  # merged, not recomputed at 128
        full = orig(fgp._y[0])
        np.testing.assert_allclose(np.asarray(yt128), np.asarray(full),
                                   atol=1e-10, err_msg=cls.__name__)
        fgp._ft_jit = orig
        # the merged cache feeds a solve that matches a fresh model's
        fresh = cls(2, seed_for_seq=7, alpha=2)
        xf = fresh.get_x_next(128)
        fresh.add_y_next(jnp.asarray(f(np.asarray(xf))))
        np.testing.assert_allclose(np.asarray(fgp.coeffs), np.asarray(fresh.coeffs),
                                   atol=1e-8)
