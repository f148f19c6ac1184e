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


def bench_fit_steps(gp, iters=30, reps=3):
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
    """End-to-end posterior mean+var latency at n_query points (incl. fetch)."""
    xt = np.random.default_rng(11).random((n_query, gp.d))
    pm = np.asarray(gp.post_mean(xt))   # warmup/compile
    pv = np.asarray(gp.post_var(xt))
    assert np.isfinite(pm).all() and (pv >= -1e-6).all()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(gp.post_mean(xt))
        np.asarray(gp.post_var(xt))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_hmc(n=1 << 14, d=4, num_chains=8, num_samples=100, num_warmup=100):
    """HMC THROUGHPUT cell (samples/s).  The model is MAP-warm-started (the
    standard hyperposterior workflow); the reported rhat is a diagnostic at
    this deliberately small bench budget and is NOT the sampler's quality
    bar — that is examples/hmc_quality_results.json (max R-hat 1.0016 at the
    400/400 protocol)."""
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


HBM_GBPS = 819.0  # v5e HBM bandwidth


def _roofline_mll(n, d, complex_ft=True):
    """Estimated HBM traffic (bytes) of one MLL fit step (fwd + bwd).

    Counts: k1parts read (d * n f32), kernel-series contraction intermediates
    (~2 n f32), the first-column transform (~3 passes of n complex64 or f32),
    ytilde solve + reductions (~4 n), all doubled for the backward pass.
    An estimate for a stated roofline fraction, not a measurement.
    """
    cplx = 8 if complex_ft else 4
    fwd = 4 * n * d + 2 * 4 * n + 3 * 2 * cplx * n + 4 * 4 * n
    return 2 * fwd


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
    ideal = _roofline_mll(1 << 20, 8, True) / (HBM_GBPS * 1e9)
    matrix["lattice_mll_n2e20_d8"] = {"value": round(steps_per_s, 3),
                                      "unit": "steps/s",
                                      "roofline_frac": round(ideal / dt, 3)}
    del gp

    # the headline JSON line goes out FIRST so a hang/OOM in any extra
    # config can never cost the round its perf artifact
    print(json.dumps({
        "metric": "MLL steps/s, n=2^20 lattice, d=8, single chip",
        "value": round(steps_per_s, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / 1.0, 3),
    }), flush=True)

    def extra(name, fn):
        if time.perf_counter() - t_start > budget_s:
            matrix[name] = {"skipped": f"over {budget_s:.0f}s budget"}
        else:
            try:
                matrix[name] = fn()
            except Exception as e:
                matrix[name] = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
        with open("BENCH_MATRIX.json", "w") as fh:  # incremental: survive kills
            json.dump(matrix, fh, indent=1)
        print(name, json.dumps(matrix[name]), file=sys.stderr, flush=True)

    def _lattice22():
        gp = make_lattice(1 << 22, 8)
        dt22 = bench_fit_steps(gp, iters=10)
        return {"value": round(1.0 / dt22, 3), "unit": "steps/s",
                "roofline_frac": round(_roofline_mll(1 << 22, 8, True)
                                       / (HBM_GBPS * 1e9) / dt22, 3)}

    _dnb2_gp = []

    def _dnb2_mll():
        _dnb2_gp.append(make_dnb2(1 << 20, 8))
        dtd = bench_fit_steps(_dnb2_gp[0])
        return {"value": round(1.0 / dtd, 3), "unit": "steps/s",
                "roofline_frac": round(_roofline_mll(1 << 20, 8, False)
                                       / (HBM_GBPS * 1e9) / dtd, 3)}

    def _dnb2_post():
        gp = _dnb2_gp[0] if _dnb2_gp else make_dnb2(1 << 20, 8)
        out = {"value": round(bench_posterior(gp), 4), "unit": "s"}
        _dnb2_gp.clear()
        return out

    def _multitask():
        gp = make_lattice(1 << 16, 4, num_tasks=3)
        return {"value": round(1.0 / bench_fit_steps(gp), 3),
                "unit": "steps/s"}

    def _grad_informed():
        gp = make_lattice_grad(1 << 14, 3)
        return {"value": round(1.0 / bench_fit_steps(gp), 3),
                "unit": "steps/s"}

    def _hmc():
        # 150 warmup: the dense-mass window (starts at warmup/4) needs
        # ~100 steps of moments before its (dim, dim) estimate stabilizes
        sps, diags = bench_hmc(num_samples=50, num_warmup=150)
        return {"value": round(sps, 2), "unit": "samples/s",
                "rhat_max_at_bench_budget":
                    round(max(v["rhat"] for v in diags.values()), 4)}

    extra("lattice_mll_n2e22_d8", _lattice22)
    extra("dnb2_mll_n2e20_d8", _dnb2_mll)
    extra("dnb2_post_query_n2e20_N2e14", _dnb2_post)
    extra("lattice_multitask3_mll_n2e16", _multitask)
    extra("lattice_grad_d3_mll_n2e14", _grad_informed)
    extra("hmc_8chain_n2e14_d4", _hmc)


if __name__ == "__main__":
    main()
