"""Fit-loop variants: GCV and CV losses, masks, cv_weights, histories."""

import numpy as np
import pytest

import jax.numpy as jnp

from fastgaussianprocesses_tpu import FastGPLattice, StandardGP
from util_oracle import dense_gram


def _data(fgp, n=64, f=None):
    x = np.asarray(fgp.get_x_next(n))
    y = np.sin(2 * np.pi * x[:, 0]) if f is None else f(x)
    fgp.add_y_next(jnp.asarray(np.broadcast_to(y, fgp.shape_batch + y.shape)))
    return x, y


@pytest.mark.parametrize("metric", ["GCV", "CV"])
def test_alternative_loss_metrics_run_and_improve(metric):
    fgp = FastGPLattice(2, seed_for_seq=7, noise=1e-4)
    _data(fgp)
    data = fgp.fit(loss_metric=metric, iterations=15, verbose=0, store_loss_hist=True)
    lh = data["loss_hist"]
    assert np.isfinite(lh).all()
    assert lh[-1] <= lh[0] + 1e-9  # loss metrics decrease


def test_gcv_terms_match_dense():
    """GCV numerator/denominator against dense formulas (util.py:254-261)."""
    fgp = FastGPLattice(2, seed_for_seq=5, noise=1e-3)
    _data(fgp, n=32)
    K = dense_gram(fgp)
    y = np.asarray(fgp.y)
    Kinv = np.linalg.inv(K)
    v = Kinv @ y
    solver = fgp._solver()
    numer, denom = solver.gcv_terms()
    np.testing.assert_allclose(float(np.asarray(numer)[0]), (v**2).sum(), rtol=1e-7)
    np.testing.assert_allclose(float(np.asarray(denom)[0]),
                               (np.trace(Kinv) / len(y)) ** 2, rtol=1e-7)


def test_cv_inv_diag_exact():
    """Fast-path inv_diag equals the dense K^-1 diagonal (exact, cf. the
    reference's approximation at util.py:381-394)."""
    fgp = FastGPLattice(2, seed_for_seq=5, noise=1e-3)
    _data(fgp, n=32)
    K = dense_gram(fgp)
    want = np.diag(np.linalg.inv(K))
    got = np.asarray(fgp._solver().inv_diag())
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # multitask
    fgp2 = FastGPLattice(2, num_tasks=2, seed_for_seq=6, noise=1e-3)
    xs = fgp2.get_x_next([32, 8], task=[0, 1])
    fgp2.add_y_next([jnp.asarray(np.sin(np.asarray(x)[:, 0])) for x in xs], task=[0, 1])
    K2 = dense_gram(fgp2)
    want2 = np.diag(np.linalg.inv(K2))
    got2 = np.asarray(fgp2._solver().inv_diag())
    np.testing.assert_allclose(got2, want2, rtol=1e-6)


def test_masked_fit_only_moves_masked_outputs():
    B = 3
    fgp = FastGPLattice(2, seed_for_seq=7, shape_batch=(B,),
                        shape_lengthscales=(B, 2), shape_scale=(B, 1))
    x = np.asarray(fgp.get_x_next(64))
    ys = np.stack([np.sin(2 * np.pi * x[:, 0]) * (b + 1) for b in range(B)])
    fgp.add_y_next(jnp.asarray(ys))
    ls0 = np.asarray(fgp.lengthscales).copy()
    fgp.fit(iterations=8, verbose=0, masks=np.array([[0]]))
    ls1 = np.asarray(fgp.lengthscales)
    assert not np.allclose(ls1[0], ls0[0])  # masked batch element moved
    np.testing.assert_allclose(ls1[1:], ls0[1:])  # others untouched


def test_cv_weights():
    fgp = FastGPLattice(2, seed_for_seq=7, noise=1e-4)
    _data(fgp)
    w = jnp.asarray(np.linspace(0.5, 2.0, 64))
    data = fgp.fit(loss_metric="CV", iterations=5, verbose=0, cv_weights=w,
                   store_loss_hist=True)
    assert np.isfinite(data["loss_hist"]).all()


def test_history_storage_shapes():
    fgp = StandardGP(2, seed_for_seq=7)
    _data(fgp, n=32)
    data = fgp.fit(iterations=6, verbose=0, store_hists=True)
    it = data["iterations"]
    assert data["loss_hist"].shape == (it + 1,)
    assert data["scale_hist"].shape == (it + 1, 1)
    assert data["lengthscales_hist"].shape == (it + 1, 2)
    assert data["noise_hist"].shape == (it + 1, 1)
    assert data["task_kernel_hist"].shape == (it + 1, 1, 1)


def test_chunked_fit_dispatch_matches_unchunked(tmp_path):
    """steps_per_dispatch>1 runs K steps per jitted scan but must reproduce
    the unchunked fit EXACTLY: same per-step losses, same early-stop point,
    same final parameters, same checkpoint state."""
    def build():
        gp = FastGPLattice(2, seed_for_seq=13)
        x = np.asarray(gp.get_x_next(64))
        gp.add_y_next(jnp.asarray(np.sin(2 * np.pi * x[:, 0]) + x.sum(1)))
        return gp

    ck1, ck4 = str(tmp_path / "c1.npz"), str(tmp_path / "c4.npz")
    g1 = build()
    d1 = g1.fit(iterations=23, verbose=0, store_hists=True,
                checkpoint_path=ck1, checkpoint_every=5, steps_per_dispatch=1)
    g4 = build()
    d4 = g4.fit(iterations=23, verbose=0, store_hists=True,
                checkpoint_path=ck4, checkpoint_every=5, steps_per_dispatch=4)
    assert d1["iterations"] == d4["iterations"]
    np.testing.assert_array_equal(d1["loss_hist"], d4["loss_hist"])
    np.testing.assert_array_equal(d1["scale_hist"], d4["scale_hist"])
    np.testing.assert_array_equal(d1["lengthscales_hist"], d4["lengthscales_hist"])
    for k in g1.params:
        np.testing.assert_array_equal(np.asarray(g1.params[k].raw),
                                      np.asarray(g4.params[k].raw), err_msg=k)
    c1, c4 = np.load(ck1), np.load(ck4)
    assert set(c1.files) == set(c4.files)
    for k in c1.files:
        np.testing.assert_array_equal(c1[k], c4[k], err_msg=k)


def test_fused_fit_matches_unchunked():
    """steps_per_dispatch=-1 runs the whole fit (early stopping included)
    inside one lax.while_loop; final params, best loss and the stop
    iteration must match the host-loop fit exactly (CPU f64)."""
    def build():
        gp = FastGPLattice(2, seed_for_seq=21)
        x = np.asarray(gp.get_x_next(64))
        gp.add_y_next(jnp.asarray(np.sin(2 * np.pi * x[:, 0]) - x.sum(1)))
        return gp

    g1 = build()
    d1 = g1.fit(iterations=200, verbose=0)  # early stop fires well before 200
    gf = build()
    df = gf.fit(iterations=200, verbose=0, steps_per_dispatch=-1)
    assert d1["iterations"] == df["iterations"]
    for k in g1.params:
        np.testing.assert_array_equal(np.asarray(g1.params[k].raw),
                                      np.asarray(gf.params[k].raw), err_msg=k)
    # per-step observables are host-side by construction: fused mode refuses
    import pytest as _pytest
    with _pytest.raises(ValueError):
        build().fit(iterations=5, verbose=0, store_loss_hist=True,
                    steps_per_dispatch=-1)


def test_fused_fit_resume_matches_unchunked(tmp_path):
    """A checkpointed fit resumed in FUSED mode (steps_per_dispatch=-1)
    lands on the same final parameters and stop iteration as an
    uninterrupted host-loop run (counters i0/waits/best flow into the
    device carry)."""
    def build():
        gp = FastGPLattice(2, seed_for_seq=29)
        x = np.asarray(gp.get_x_next(64))
        gp.add_y_next(jnp.asarray(np.cos(2 * np.pi * x[:, 1]) + x.sum(1)))
        return gp

    g_full = build()
    d_full = g_full.fit(iterations=60, verbose=0)
    ck = str(tmp_path / "ck.npz")
    g_a = build()
    g_a.fit(iterations=15, verbose=0, checkpoint_path=ck, checkpoint_every=15)
    g_b = build()
    d_b = g_b.fit(iterations=60, verbose=0, resume_from=ck,
                  steps_per_dispatch=-1)
    assert d_b["iterations"] == d_full["iterations"]
    for k in g_full.params:
        np.testing.assert_array_equal(np.asarray(g_b.params[k].raw),
                                      np.asarray(g_full.params[k].raw),
                                      err_msg=k)
