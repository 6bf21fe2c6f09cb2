"""Benchmark: end-to-end ESS/sec on the reference's own FitzHugh-Nagumo
protocol (the metric of record, BASELINE.json).

Workload parity with the reference example (run_scripts/fn_example.jl:22-41):
100 observations on [0, 20], filllevel-2 discretization -> n = 397 grid
points, D = 2, Matern-5/2, sigma sampled (Psi dim = 799), at the DEFAULT
prior temperatures the reference's own E2E test asserts recovery on
(test/runtests.jl:65-115; see the BETA note below for why not [1,1,5]).

Headline: min-theta ESS/sec of the PRODUCTION stack (NLML init -> staged
Gauss-Newton MAP -> Laplace whitening -> 128 vmapped NUTS chains with the
cross-chain pooled dense metric, target accept 0.95, step jitter 0.125),
i.e. what `solve_magi(..., sampler='nuts', n_chains=128,
mass_matrix='dense-pooled', x_whitened=True, target_accept_ratio=0.95,
step_jitter=0.125)` delivers (the measured ESS/sec optimum of the
chain-count sweep — benchmarks/chain_sweep_r5.jsonl),
reported as the MEDIAN over seeds {42, 7, 123} over TOTAL wall (setup +
compile + warmup + sampling). Single-basin sampling, matching what the
reference's own chain samples at this protocol (BENCHMARKS.md
multimodality notes; PT explores the full tempered posterior).

The reference publishes no numbers (BASELINE.md) and no Julia runtime
exists on this machine, so ``vs_baseline`` is established quantitatively
on the spot from two measurements (reasoning in docs/BENCHMARKS.md):
  ref ESS/sec <= (reference-faithful CPU grad rate)
                x (raw-geometry ESS per gradient evaluation)
The CPU grad rate is a float64 NumPy/BLAS implementation of exactly the
reference's likelihood+gradient (/root/reference/src/likelihoods.jl: same
banded matrices, same hand-derived gradient); ESS-per-gradient is measured
by running OUR raw-space NUTS on the same posterior geometry the reference
samples (its AdvancedHMC faces the identical tree-depth saturation).
vs_baseline = production ESS/sec / that bound.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ESS/s", "vs_baseline": N, ...}
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# The driver records this process's stderr tail as the benchmark artifact;
# drop the per-program-load relay-AOT tuning-flag mismatch noise (each
# line individually VERIFIED benign before suppression — see
# utils/stderr_filter.py; VERDICT r4 item 4). Loaded by file path so
# bench keeps its deliberate lazy-jax layering (the package __init__
# imports jax; jax must stay unimported until wait_for_backend's
# subprocess probe has cleared the relay).


def _install_stderr_filter():
    import importlib.util

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "manifold_constrained_gaussian_process_inference_tpu",
        "utils", "stderr_filter.py",
    )
    spec = importlib.util.spec_from_file_location("_magi_stderr_filter", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.install_benign_aot_filter()


_install_stderr_filter()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# Backend acquisition (relay-outage resilience)
# ---------------------------------------------------------------------------

def _is_backend_unavailable(exc: BaseException) -> bool:
    """The axon TPU relay reports transient outages as RuntimeError
    'Unable to initialize backend ... UNAVAILABLE' (BENCH_r03.json died on
    exactly this at its first device_put). Match broadly but only on
    backend-init shapes, not arbitrary RuntimeErrors."""
    msg = str(exc)
    return (
        "Unable to initialize backend" in msg
        or "UNAVAILABLE" in msg
        or "Backend 'axon' failed to initialize" in msg
    )


def _probe_backend_subprocess(timeout_s: float = 120.0) -> bool:
    """Probe the relay in a SUBPROCESS with a hard timeout. The relay has
    TWO outage shapes: a raised RuntimeError(UNAVAILABLE), and a silent
    HANG inside backend init (jax.devices() blocks in C++ RPC forever —
    measured >12 min on 2026-08-18; in-process polling cannot recover from
    that, signals do not interrupt the blocked extension call). A killable
    child answers 'is the relay up?' without wedging this process."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False
    except Exception:
        return False


def wait_for_backend(max_wait_s: float = 900.0, poll_s: float = 30.0) -> bool:
    """Wait until the TPU relay answers, bounded by CLAUDE.md's documented
    outage window. Each attempt probes in a killable subprocess (see
    _probe_backend_subprocess — in-process jax.devices() can hang forever)
    and only touches in-process init once a probe succeeds. Clears JAX's
    backend cache between attempts so a previously cached init failure
    re-runs. Returns True if a backend is live, False if the window
    expired."""
    import jax

    t0 = time.perf_counter()
    attempt = 0
    while True:
        if _probe_backend_subprocess():
            try:  # reset any cached init failure, then init for real
                from jax._src import xla_bridge as _xb

                _xb._clear_backends()
            except Exception:
                pass
            try:
                devs = jax.devices()
                if attempt:
                    log(f"backend up after {time.perf_counter() - t0:.0f}s: "
                        f"{devs}")
                return True
            except Exception as e:
                if not _is_backend_unavailable(e):
                    raise
                # probe raced an outage; fall through to the wait logic
        waited = time.perf_counter() - t0
        if waited >= max_wait_s:
            log(f"backend still unavailable after {waited:.0f}s")
            return False
        log(
            f"backend unavailable (attempt {attempt}, {waited:.0f}s "
            f"elapsed); retrying in {poll_s:.0f}s"
        )
        time.sleep(poll_s)
        attempt += 1


def _retry_on_outage(fn, *args, stage="stage", **kwargs):
    """Run a bench stage; if the relay drops mid-run, wait out the outage
    once and retry the stage, rather than losing the whole artifact."""
    try:
        return fn(*args, **kwargs)
    except Exception as e:
        if not _is_backend_unavailable(e):
            raise
        log(f"{stage}: backend dropped mid-run ({e}); waiting for relay")
        if not wait_for_backend():
            raise
        return fn(*args, **kwargs)


# ---------------------------------------------------------------------------
# Workload construction
# ---------------------------------------------------------------------------

# Default temperatures — the protocol the reference's own E2E test asserts
# recovery on (test/runtests.jl:65-115). The run_scripts plotting example
# uses beta=[1,1,5], which makes the tempered posterior genuinely BIMODAL
# (sigma-inflated basin; docs/BENCHMARKS.md multimodality notes): any
# well-mixing sampler honestly visits both basins there, so single-number
# ESS/sec is ill-defined at [1,1,5]; PT full-posterior exploration of it
# is benchmarked separately (benchmarks/run_baseline_configs.py config 6).
BETA = (1.0, 1.0, 1.0)

# Seeds for the production stage (the headline is the median across them;
# seed 7 is deliberately included — it was the round-2 outlier with 902
# divergences and is the regression guard for the divergence-robust pooled
# metric).
PRODUCTION_SEEDS = (42, 7, 123)

# Production chain count: the measured ESS/sec optimum from
# benchmarks/chain_sweep.py (chain_sweep_r5.jsonl, seeds 42/7/123,
# TA=0.95, step_jitter=0.125, round-5 code). With the pocket tamed by
# step jitter, 128 chains beats 64 on every seed (total ESS/s 108-159
# vs 67-124): min-theta ESS scales SUPERLINEARLY 64->128 (the pooled
# metric improves with the batch — divergences DROP 80/276/66 ->
# 36/185/28) while wall grows only ~1.4x. 256 regresses (seed 42:
# 107.6 total — per-iteration cost doubles past HBM amortization).
# Round-4's 64-chain optimum was an artifact of the unjittered pocket
# (seed 123 @128: 1376 divergences, since fixed — docs/BENCHMARKS.md).
N_CHAINS = 128

# Production step-size jitter (p, applied via bench_production): see the
# MagiConfig comment in bench_production. Default decided by same-day A/B
# on the 128-chain pocket reproducer + production seeds (docs/BENCHMARKS.md
# round-5 pocket section).
STEP_JITTER = 0.125

# Divergence-informed curvature envelope (config.divergence_envelope):
# False until the TPU A/B on the pocket reproducer decides the production
# default (candidate: envelope on + jitter reduced/off — it fixes the
# pocket's geometry at FULL eps instead of jitter's downward eps tax).
ENVELOPE = False


def build_workload(n_obs=100, t_end=20.0, fill=2, seed=42):
    import jax.numpy as jnp

    from manifold_constrained_gaussian_process_inference_tpu.inference.target import (
        MagiTarget,
    )
    from manifold_constrained_gaussian_process_inference_tpu.models import FN_SYSTEM
    from manifold_constrained_gaussian_process_inference_tpu.ops.gp_cov import (
        build_gp_cov,
    )
    from manifold_constrained_gaussian_process_inference_tpu.utils.integrators import (
        integrate_system,
        sample_on_grid,
    )

    rng = np.random.default_rng(seed)
    theta_true = np.array([0.2, 0.2, 3.0])
    ts, xs = integrate_system(FN_SYSTEM, [-1.0, 1.0], 0.0, t_end, theta_true, 4000)
    t_obs = np.linspace(0.0, t_end, n_obs)
    y_at_obs = sample_on_grid(ts, xs, t_obs) + 0.2 * rng.normal(size=(n_obs, 2))

    ins = 2**fill - 1
    segs = [
        np.linspace(t_obs[i], t_obs[i + 1], ins + 2)[:-1]
        for i in range(n_obs - 1)
    ]
    t_grid = np.concatenate(segs + [t_obs[-1:]])
    y_grid = np.full((len(t_grid), 2), np.nan)
    y_grid[:: ins + 1] = y_at_obs

    phi = np.array([[2.0, 2.0], [1.5, 1.5]])
    cov = build_gp_cov("matern52", phi, t_grid, bandsize=20, complexity=2,
                       jitter=1e-6)
    target = MagiTarget.build(
        y_grid, cov, FN_SYSTEM, sigma_init=np.array([0.2, 0.2]),
        prior_temperature=np.array(BETA), sigma_is_fixed=False,
    )
    x0 = np.stack(
        [np.interp(t_grid, t_obs, y_at_obs[:, d]) for d in range(2)], axis=-1
    )
    psi0 = np.concatenate([x0.T.reshape(-1), theta_true, np.log([0.2, 0.2])])
    host = dict(
        y=y_grid, t=t_grid, cov=cov, phi=phi, x0=x0, theta=theta_true,
        t_obs=t_obs, y_at_obs=y_at_obs,
    )
    return target, psi0, host


# ---------------------------------------------------------------------------
# Device throughput
# ---------------------------------------------------------------------------

def bench_device_grad(target, psi0, n_evals=3000):
    import jax
    import jax.numpy as jnp

    dtype = target.data.mask.dtype
    vg = target.value_and_grad_fn()
    psi = jnp.asarray(psi0, dtype)

    @jax.jit
    def chained(psi, n):
        # Chain evaluations so each depends on the previous (no batching
        # tricks): mimics the sequential leapfrog data dependence in NUTS.
        def body(_, p):
            v, g = vg(p)
            return p + 1e-6 * g / (1.0 + jnp.abs(v))

        return jax.lax.fori_loop(0, n, body, psi)

    chained(psi, 3).block_until_ready()  # compile
    t0 = time.perf_counter()
    chained(psi, n_evals).block_until_ready()
    dt = time.perf_counter() - t0
    return n_evals / dt


def bench_production(host, n_iters=3000, seed=42, n_chains=N_CHAINS,
                     step_jitter=STEP_JITTER, envelope=ENVELOPE,
                     diag_out=None):
    """The production stack on the reference protocol, through the public
    API: solve_magi with NLML init -> staged Gauss-Newton MAP -> Laplace
    whitening -> pooled-dense-metric multi-chain NUTS. Reports min-theta
    ESS/sec over TOTAL wall time (setup + compiles + warmup + sampling)
    and recovery."""
    from manifold_constrained_gaussian_process_inference_tpu import solve_magi
    from manifold_constrained_gaussian_process_inference_tpu.config import (
        MagiConfig,
    )
    from manifold_constrained_gaussian_process_inference_tpu.models import (
        FN_SYSTEM,
    )
    from manifold_constrained_gaussian_process_inference_tpu.postprocess.diagnostics import (
        ess,
        split_rhat,
    )

    config = MagiConfig(
        niter_hmc=n_iters,
        burnin_ratio=0.5,
        step_size_factor=0.06,
        prior_temperature=BETA,
        # Single-basin production sampler: 16 whitened vmapped NUTS chains
        # sharing a cross-chain pooled dense metric, started at the GN mode
        # (data basin). This matches what the reference's own single
        # 50k-iteration chain samples at this protocol (it never leaves the
        # data basin; the tempered posterior's sigma-inflated basin is
        # config 6's PT job — see docs/BENCHMARKS.md multimodality notes).
        sampler="nuts",
        n_chains=n_chains,
        mass_matrix="dense-pooled",
        chain_init_jitter=0.05,
        x_whitened=True,
        # The ODE declares positive rate constants; sampling through the
        # bounded reparameterization keeps the tempered posterior's c<0
        # mirror basin out (measured: unconstrained chains migrate there
        # at beta_obs=5 once PT swaps actually work).
        theta_constrained=True,
        # 0.95, not the 0.8 default: the posterior has a localized sharp-
        # curvature pocket at theta_b ~ 0.48 (P(divergence)=0.64 inside it
        # at the eps that 0.8 adapts to; ~0.002 elsewhere). A chain
        # entering it sticks and floods the run with divergences — the
        # round-2 seed-7 cluster (902 divergences, ESS 95). At 0.95 the
        # smaller adapted eps resolves the pocket: seed-7 measured
        # 1043 div / ESS 119 / 0.74 ESS/s (0.8) -> 1 div / ESS 3332 /
        # 26.8 ESS/s (0.95) — 36x, and wall time DROPPED (divergent
        # rebuilds cost more than the extra leapfrogs).
        target_accept_ratio=0.95,
        # Pocket insurance: 0.95 resolves the theta_b~0.48 pocket MOSTLY,
        # but a chain that still wanders in freezes on divergent
        # rejections (128-chain sweep seed 123: one chain, 1376
        # divergences, min ESS 26.6k -> 8.9k). A downward-only jittered
        # step on a shared ~1/8 of iterations gives every stuck chain a
        # periodic escape hatch at ~8% extra leapfrogs
        # (parallel/chains.py step_jitter; validated on that reproducer —
        # docs/BENCHMARKS.md).
        step_jitter=step_jitter,
        # The PRINCIPLED pocket treatment (parallel/chains.py
        # CurvatureEnvelope): exact-Hessian probes at divergent warmup
        # leaves, PSD-max folded into the pooled metric — fixes the
        # pocket's geometry instead of (step_jitter) periodically
        # shrinking eps for every chain.
        divergence_envelope=envelope,
        seed=seed,
        # Full-precision contractions lengthen each device call ~3x; the
        # remote worker crashes on multi-minute single executions — bound
        # them (measured: chunk 1000 crashed the worker on this workload).
        chunk_size=250,
    )
    t0 = time.perf_counter()
    res = solve_magi(host["y"], host["t"], FN_SYSTEM, config)
    dt = time.perf_counter() - t0

    theta = res.theta  # (R*S, k)
    tpc = res.diagnostics["theta_per_chain"]  # (R, S, k) cold chains
    ess_vals = np.array([ess(tpc[:, :, j]) for j in range(tpc.shape[-1])])
    rhat_vals = np.array(
        [split_rhat(tpc[:, :, j]) for j in range(tpc.shape[-1])]
    )
    theta_mean = theta.mean(axis=0)
    sigma_mean = res.sigma.mean(axis=0)
    theta_true = host["theta"]
    d = res.diagnostics
    out = dict(
        ess_min=float(np.nanmin(ess_vals)),
        rhat_max=float(np.nanmax(rhat_vals)),
        ess_per_sec=float(np.nanmin(ess_vals) / dt),
        ess_per_sec_sampling=float(
            np.nanmin(ess_vals) / d["sampling_time_s"]
        ),
        total_time_s=dt,
        sampling_time_s=float(d["sampling_time_s"]),
        theta_rmse=float(np.sqrt(np.mean((theta_mean - theta_true) ** 2))),
        sigma_rmse=float(np.sqrt(np.mean((sigma_mean - 0.2) ** 2))),
        theta_mean=[round(float(x), 4) for x in theta_mean],
        sigma_mean=[round(float(x), 4) for x in sigma_mean],
        divergences=int(d["n_divergent"]),
        grad_evals=float(d["gradient_evals"]),
    )
    if "envelope_points" in d:
        out["envelope_points"] = int(d["envelope_points"])
        out["envelope_boost_dirs"] = int(d["envelope_boost_dirs"])
        out["envelope_boost_max"] = round(float(d["envelope_boost_max"]), 1)
    if diag_out is not None:
        # Per-chain per-draw tree stats for offline analysis (the
        # lockstep decomposition probe) — (C, S) post-warmup arrays.
        diag_out["num_leapfrog"] = np.asarray(d["num_leapfrog"])
        diag_out["tree_depth"] = np.asarray(d["tree_depth"])
    # Swap statistics exist only for PT samplers; emitting them as NaN for
    # plain NUTS made BENCH_r02.json non-strict JSON (VERDICT r2 item 5).
    if "swap_acceptance" in d:
        out["swap_acceptance"] = float(d["swap_acceptance"])
        out["swap_acceptance_per_pair"] = [
            round(float(x), 3)
            for x in np.atleast_1d(d["swap_acceptance_per_pair"])
        ]
    return out


def bench_nuts_ess(target, psi0, n_chains=16, n_samples=600, n_adapts=300):
    import jax
    import jax.numpy as jnp

    from manifold_constrained_gaussian_process_inference_tpu.parallel.chains import (
        run_chains,
    )
    from manifold_constrained_gaussian_process_inference_tpu.postprocess.diagnostics import (
        ess,
    )

    dtype = target.data.mask.dtype
    vg = target.value_and_grad_fn()
    psi0s = jnp.asarray(np.tile(psi0, (n_chains, 1)), dtype)
    keys = jax.random.split(jax.random.PRNGKey(0), n_chains)

    # compile (excluded from timing)
    s, _ = run_chains(vg, psi0s, keys, n_samples=4, n_adapts=2,
                      initial_step_size=0.01, chunk_size=100)
    np.asarray(s)

    t0 = time.perf_counter()
    samples, info = run_chains(
        vg, psi0s, keys, n_samples=n_samples, n_adapts=n_adapts,
        initial_step_size=0.01, target_accept=0.8, chunk_size=100,
    )
    samples = np.asarray(samples)
    dt = time.perf_counter() - t0

    n, d = target.n_times, target.n_dims
    theta = samples[:, :, n * d : n * d + target.n_params_ode]
    ess_vals = np.array([ess(theta[:, :, j]) for j in range(theta.shape[-1])])
    grad_evals = float(np.sum(np.asarray(info["num_leapfrog"])))
    return dict(
        ess_min=float(np.nanmin(ess_vals)),
        ess_per_sec=float(np.nanmin(ess_vals) / dt),
        sampling_time=dt,
        grad_evals=grad_evals,
        grad_evals_per_sec=grad_evals / dt,
        divergences=int(np.sum(np.asarray(info["diverging"]))),
    )


# ---------------------------------------------------------------------------
# Reference-faithful CPU baseline (float64 NumPy/BLAS, hand gradient)
# ---------------------------------------------------------------------------

def make_numpy_reference(host):
    """Value+gradient exactly as likelihoods.jl computes them, on banded-
    truncated dense float64 matrices with BLAS matvecs."""
    cov = host["cov"]
    cinv = np.asarray(cov.Cinv_band, dtype=np.float64)
    mphi = np.asarray(cov.mphi_band, dtype=np.float64)
    kinv = np.asarray(cov.Kinv_band, dtype=np.float64)
    y = host["y"]
    mask = np.isfinite(y)
    yf = np.where(mask, y, 0.0)
    nobs = mask.sum(axis=0)
    tvec = host["t"]
    beta = np.array(BETA)
    n, d = y.shape

    def fn_f(x, theta):
        v, r = x[:, 0], x[:, 1]
        a, b, c = theta
        return np.stack([c * (v - v**3 / 3 + r), -(v - a + b * r) / c], -1)

    def fn_jx(x, theta):
        v = x[:, 0]
        a, b, c = theta
        j = np.zeros((n, 2, 2))
        j[:, 0, 0] = c * (1 - v**2)
        j[:, 0, 1] = c
        j[:, 1, 0] = -1 / c
        j[:, 1, 1] = -b / c
        return j

    def fn_jt(x, theta):
        v, r = x[:, 0], x[:, 1]
        a, b, c = theta
        j = np.zeros((n, 2, 3))
        j[:, 0, 2] = v - v**3 / 3 + r
        j[:, 1, 0] = 1 / c
        j[:, 1, 1] = -r / c
        j[:, 1, 2] = (v - a + b * r) / c**2
        return j

    def value_and_grad(psi):
        x = psi[: n * d].reshape(d, n).T
        theta = psi[n * d : n * d + 3]
        log_sigma = np.clip(psi[n * d + 3 :], -15.0, 15.0)
        sigma = np.exp(log_sigma)
        s2 = sigma**2
        f = fn_f(x, theta)
        ll = 0.0
        grad_x = np.zeros((n, d))
        grad_theta = np.zeros(3)
        grad_sigma = np.zeros(d)
        ke_all = np.zeros((n, d))
        for p in range(d):
            xl = x[:, p]
            e_lvl = np.where(mask[:, p], xl - yf[:, p], 0.0)
            mx = mphi[p] @ xl
            e_drv = f[:, p] - mx
            ke = kinv[p] @ e_drv
            cx = cinv[p] @ xl
            ke_all[:, p] = ke
            sse = float(e_lvl @ e_lvl)
            ll += (-0.5 * sse / s2[p] - 0.5 * nobs[p] * np.log(2 * np.pi * s2[p])) / beta[2]
            ll += -0.5 * float(e_drv @ ke) / beta[0]
            ll += -0.5 * float(xl @ cx) / beta[1]
            grad_x[:, p] += -np.where(mask[:, p], e_lvl, 0.0) / s2[p] / beta[2]
            grad_x[:, p] += -cx / beta[1]
            grad_x[:, p] += (mphi[p].T @ ke) / beta[0]
            grad_sigma[p] = (sse / s2[p] - nobs[p]) / (sigma[p] * beta[2])
        jx = fn_jx(x, theta)
        jt = fn_jt(x, theta)
        ke_scaled = ke_all / beta[0]
        grad_x -= np.einsum("ipj,ip->ij", jx, ke_scaled)
        grad_theta -= np.einsum("ipm,ip->im", jt, ke_scaled).sum(axis=0)
        # log-sigma reparam + Jacobian prior term
        ll += float(np.sum(log_sigma))
        grad_log_sigma = grad_sigma * sigma + 1.0
        return ll, np.concatenate(
            [grad_x.T.reshape(-1), grad_theta, grad_log_sigma]
        )

    return value_and_grad


def bench_numpy_reference(host, psi0, n_evals=60):
    vg = make_numpy_reference(host)
    psi = psi0.astype(np.float64)
    vg(psi)  # warm
    t0 = time.perf_counter()
    p = psi
    for _ in range(n_evals):
        v, g = vg(p)
        p = p + 1e-6 * g / (1.0 + abs(v))
    dt = time.perf_counter() - t0
    return n_evals / dt, vg


def main():
    from manifold_constrained_gaussian_process_inference_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    # Acquire the backend FIRST, riding out relay outages (round 3's entire
    # TPU record was lost to a transient init failure at first device_put).
    # MAGI_BACKEND_MAX_WAIT_S widens the window for unattended runs; the
    # default stays inside a driver-sized budget.
    max_wait = float(os.environ.get("MAGI_BACKEND_MAX_WAIT_S", 900))
    poll = float(os.environ.get("MAGI_BACKEND_POLL_S", 30))
    if not wait_for_backend(max_wait_s=max_wait, poll_s=poll):
        log("proceeding anyway; stages will fail with backend errors")
    target, psi0, host = build_workload()
    log(f"workload: n={target.n_times}, D={target.n_dims}, psi dim={psi0.shape[0]}")

    # cross-check device vs reference-faithful implementation
    import jax.numpy as jnp

    vg_dev = target.value_and_grad_fn()
    v_dev, g_dev = _retry_on_outage(
        vg_dev, jnp.asarray(psi0, target.data.mask.dtype),
        stage="value/grad cross-check",
    )
    cpu_rate, vg_np = bench_numpy_reference(host, psi0)
    # The reference bound must use the rate the reference COULD achieve on
    # this machine. A concurrent process (e.g. a long CPU benchmark run)
    # deflates the live measurement, which would deflate the bound and
    # inflate vs_baseline; clamp to the best uncontended rate measured on
    # this host (1,214 evals/s, docs/BENCHMARKS.md) so contention can only
    # make our claimed advantage SMALLER, never larger.
    CPU_RATE_UNCONTENDED = 1214.0
    if cpu_rate < CPU_RATE_UNCONTENDED:
        log(
            f"cpu reference rate {cpu_rate:,.0f} evals/s below the known "
            f"uncontended rate; clamping the bound to "
            f"{CPU_RATE_UNCONTENDED:,.0f} (conservative for vs_baseline)"
        )
        cpu_rate = CPU_RATE_UNCONTENDED
    v_np, g_np = vg_np(psi0)
    rel = abs(float(v_dev) - v_np) / max(abs(v_np), 1.0)
    gerr = float(
        np.max(np.abs(np.asarray(g_dev, np.float64) - g_np))
        / max(np.max(np.abs(g_np)), 1.0)
    )
    log(f"value check: dev={float(v_dev):.4f} np={v_np:.4f} rel={rel:.2e}; grad maxrel={gerr:.2e}")

    dev_rate = _retry_on_outage(
        bench_device_grad, target, psi0, stage="device grad rate"
    )
    log(f"device grad rate: {dev_rate:,.0f} evals/s; cpu reference rate: {cpu_rate:,.0f} evals/s")

    result = {
        "metric": (
            "production min-theta ESS/sec (median over seeds "
            f"{list(PRODUCTION_SEEDS)}), FN reference workload "
            "(n=397, D=2, sigma sampled, default temperatures — the "
            "reference E2E test protocol)"
        ),
        "unit": "ESS/s",
        "device_grad_evals_per_sec": round(dev_rate, 1),
        "grad_rate_vs_cpu_reference": round(dev_rate / cpu_rate, 2),
        "baseline_cpu_evals_per_sec": round(cpu_rate, 1),
        "value_check_rel_err": rel,
        "grad_check_max_rel_err": gerr,
    }

    # Raw-geometry NUTS: measures ESS per gradient on the same posterior
    # the reference samples (tree-depth-saturating raw space) — one of the
    # two factors of the reference ESS/sec bound. Must not take the whole
    # bench down (long single XLA executions have crashed the remote TPU
    # worker before) — degrade gracefully.
    ref_ess_per_sec = None
    try:
        nuts = _retry_on_outage(bench_nuts_ess, target, psi0, stage="nuts")
        log(f"raw-geometry nuts: {nuts}")
        ess_per_grad = nuts["ess_min"] / max(nuts["grad_evals"], 1.0)
        ref_ess_per_sec = cpu_rate * ess_per_grad
        result.update(
            raw_nuts_ess_per_sec=round(nuts["ess_per_sec"], 3),
            raw_nuts_grad_evals_per_sec=round(nuts["grad_evals_per_sec"], 1),
            raw_nuts_divergences=nuts["divergences"],
            raw_ess_per_grad=ess_per_grad,
            est_reference_ess_per_sec=round(ref_ess_per_sec, 5),
        )
    except Exception as e:  # pragma: no cover
        log(f"NUTS stage failed: {type(e).__name__}: {e}")
        result["nuts_stage_error"] = f"{type(e).__name__}"

    # Production stage over multiple seeds: a single-seed ESS/sec is a draw
    # from a wide distribution (measured 25x min-ESS spread across seeds in
    # round 2 — VERDICT r2 item 4). The headline is the MEDIAN across seeds;
    # the min and per-seed rows are reported alongside.
    prods = {}
    for seed in PRODUCTION_SEEDS:
        try:
            prod = _retry_on_outage(
                bench_production, host, seed=seed, stage=f"production[{seed}]"
            )
            log(f"production stack (seed {seed}): {prod}")
            prods[seed] = prod
        except Exception as e:  # pragma: no cover
            log(f"production stage (seed {seed}) failed: {type(e).__name__}: {e}")
            result[f"production_stage_error_seed{seed}"] = f"{type(e).__name__}"

    if prods:
        rates = np.array([p["ess_per_sec"] for p in prods.values()])
        headline = float(np.median(rates))
        # Detail fields come from the seed whose rate is CLOSEST to the
        # reported median, so headline and supporting fields describe the
        # same run even when a failed seed leaves an even count (with an
        # even count np.median averages the middle pair).
        med_seed = min(
            prods, key=lambda s: abs(prods[s]["ess_per_sec"] - headline)
        )
        p_med = prods[med_seed]
        result.update(
            value=round(headline, 3),
            production_seeds=list(prods.keys()),
            production_detail_seed=med_seed,
            production_ess_per_sec_min=round(float(rates.min()), 3),
            production_ess_per_sec_per_seed={
                str(s): round(p["ess_per_sec"], 3) for s, p in prods.items()
            },
            production_divergences_per_seed={
                str(s): p["divergences"] for s, p in prods.items()
            },
            ess_per_sec_sampling_only=round(p_med["ess_per_sec_sampling"], 3),
            production_ess_min=round(
                float(min(p["ess_min"] for p in prods.values())), 1
            ),
            production_rhat_max=round(
                float(max(p["rhat_max"] for p in prods.values())), 4
            ),
            production_total_time_s=round(p_med["total_time_s"], 1),
            production_theta_rmse=round(
                float(max(p["theta_rmse"] for p in prods.values())), 4
            ),
            production_sigma_rmse=round(
                float(max(p["sigma_rmse"] for p in prods.values())), 4
            ),
            production_theta_mean=p_med["theta_mean"],
            production_sigma_mean=p_med["sigma_mean"],
        )
        if "swap_acceptance" in p_med:
            result["swap_acceptance"] = round(p_med["swap_acceptance"], 3)
            result["swap_acceptance_per_pair"] = p_med[
                "swap_acceptance_per_pair"
            ]
        if ref_ess_per_sec:
            result["vs_baseline"] = round(headline / ref_ess_per_sec, 1)
    else:
        # Degraded headline: fall back to the grad-rate metric so the
        # driver still records a number.
        result.update(
            metric=(
                "fused log-posterior value+grad evals/sec "
                "(FN NUTS workload, n=397, D=2)"
            ),
            unit="evals/s",
            value=round(dev_rate, 1),
            vs_baseline=round(dev_rate / cpu_rate, 2),
        )

    print(json.dumps(_sanitize(result), allow_nan=False))


def _sanitize(obj):
    """Strict-JSON guard: non-finite floats become None (RFC 8259 has no
    NaN/Infinity; BENCH_r02.json's literal NaN broke standard parsers)."""
    if isinstance(obj, dict):
        return {k: _sanitize(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_sanitize(v) for v in obj]
    if isinstance(obj, float) and not np.isfinite(obj):
        return None
    return obj


if __name__ == "__main__":
    main()
