"""Benchmark all five BASELINE.json configs, multiple seeds each.

Usage (TPU, default env; results stream to benchmarks/results_r2.jsonl):
    python -u benchmarks/run_baseline_configs.py [--configs 1,2,3,4,5]
        [--seeds 42,7,123] [--out benchmarks/results_r2.jsonl]

Configs (BASELINE.json "configs"):
  1 fn_known_sigma    FN n=397, sigma fixed at truth, default temperatures
  2 fn_inferred_sigma FN n=397, sigma sampled, beta=[1,1,5] (the reference
                      protocol, run_scripts/fn_example.jl:34-43) — the
                      production stack (GN-MAP -> whitening -> PT)
  3 hes1log_partial   log-Hes1, P/M observed in alternation, H never
                      (examples/hes1_example.py recipe), 8k iterations
  4 fn_dense_grid     FN filllevel-3 grid (n=793; band-storage/Pallas path)
  5 fn_multichain     16 vmapped whitened NUTS chains with split-R-hat/ESS
  6 fn_pt_full        PT full-posterior exploration at the reference
                      protocol (multimodal tempered posterior; basin
                      occupancy + basin-conditional recovery reported)
  7 fn_chees          config-1 geometry with sampler='chees' (ChEES/SNAPER
                      validation vs the NUTS row; not a BASELINE config)
  8 fn_scale_stress   FN filllevel-4 grid (n=1585; auto band-impl policy
                      stress past the dense-fit comfort zone; not a
                      BASELINE config — SURVEY §5.7 long-grid scaling)

Each run emits one JSON line: recovery (theta RMSE vs truth), min-theta
ESS, max split-R-hat, wall time, ESS/sec, plus per-config extras.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

import manifold_constrained_gaussian_process_inference_tpu as magi
from manifold_constrained_gaussian_process_inference_tpu.config import MagiConfig
from manifold_constrained_gaussian_process_inference_tpu.models import (
    FN_SYSTEM,
    HES1LOG_FIXF_SYSTEM,
)
from manifold_constrained_gaussian_process_inference_tpu.postprocess.diagnostics import (
    ess,
    split_rhat,
)

FN_THETA_TRUE = np.array([0.2, 0.2, 3.0])


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fn_data(seed, fill=2):
    from fn_example import generate_data

    return generate_data(100, 0.0, 20.0, [0.2, 0.2], seed, fill)


def theta_metrics(res, theta_true):
    tpc = res.diagnostics["theta_per_chain"]  # (C, S, k)
    k = tpc.shape[-1]
    ess_vals = np.array([ess(tpc[:, :, j]) for j in range(k)])
    rhat_vals = np.array([split_rhat(tpc[:, :, j]) for j in range(k)])
    theta_mean = res.theta.mean(axis=0)
    return dict(
        theta_mean=[round(float(x), 4) for x in theta_mean],
        theta_rmse=round(
            float(np.sqrt(np.mean((theta_mean - theta_true) ** 2))), 4
        ),
        ess_min=round(float(np.nanmin(ess_vals)), 1),
        rhat_max=round(float(np.nanmax(rhat_vals)), 4),
    )


def basin_metrics(res, theta_true, sigma_cut=0.3):
    """Basin-conditional decomposition of a multimodal tempered posterior
    (config 6; VERDICT r2 item 6). A raw theta-RMSE-vs-truth conflates
    "explored a genuinely bimodal posterior" with "recovered the wrong
    answer" — report instead, per basin (data: max sigma < sigma_cut;
    sigma-inflated: the rest):

    - occupancy of the data basin with a Monte-Carlo standard error that
      accounts for autocorrelation (SE = sqrt(p(1-p)/ESS) with Geyer ESS
      of the per-chain basin indicator);
    - theta mean and RMSE vs truth CONDITIONAL on each basin — "does the
      data basin, when visited, sit on the truth?" is the recovery claim
      a multimodal run can actually make.
    """
    sig_max = res.sigma.max(axis=1)               # (C*S,)
    in_data = sig_max < sigma_cut
    tpc = res.diagnostics["theta_per_chain"]      # (C, S, k)
    c, s, k = tpc.shape
    ind = in_data.reshape(c, s).astype(np.float64)
    p = float(in_data.mean())
    # ESS of the indicator across chains; degenerate (all-0/all-1) chains
    # have zero variance — Geyer ESS handles via nan -> fall back to n.
    ess_ind = ess(ind)
    if not np.isfinite(ess_ind) or ess_ind <= 0:
        ess_ind = float(ind.size)
    out = {
        "frac_data_basin": round(p, 3),
        "frac_data_basin_se": round(
            float(np.sqrt(max(p * (1 - p), 0.0) / ess_ind)), 4
        ),
        "basin_indicator_ess": round(float(ess_ind), 1),
    }
    for name, mask in (("data", in_data), ("inflated", ~in_data)):
        if mask.sum() < 10:
            out[f"n_{name}_basin"] = int(mask.sum())
            continue
        tm = res.theta[mask].mean(axis=0)
        out[f"theta_mean_{name}_basin"] = [round(float(x), 4) for x in tm]
        out[f"theta_rmse_{name}_basin"] = round(
            float(np.sqrt(np.mean((tm - theta_true) ** 2))), 4
        )
        out[f"sigma_mean_{name}_basin"] = [
            round(float(x), 4) for x in res.sigma[mask].mean(axis=0)
        ]
        out[f"n_{name}_basin"] = int(mask.sum())
    return out


def run_config(idx: int, seed: int) -> dict:
    t0 = time.perf_counter()
    if idx in (1, 7):
        # Config 7 = config-1 geometry with sampler='chees' (the ChEES/
        # SNAPER validation row: same workload, same whitening, adaptive
        # trajectory length instead of tree-building — is the 2-6x raw
        # throughput advantage worth anything in ESS/sec on a MAGI
        # posterior?). Everything else identical to config 1.
        data = fn_data(seed)
        from manifold_constrained_gaussian_process_inference_tpu.inference.nlml import (
            optimize_gp_hyperparameters,
        )

        hp = optimize_gp_hyperparameters(
            data["y_obs"], data["t_obs"], "matern52"
        )
        cfg = MagiConfig(
            niter_hmc=3000, step_size_factor=0.06, seed=seed,
            # 0.95 resolves the theta_b~0.48 curvature pocket (bench.py
            # production comment: 36x seed-7 ESS/s, divergences -> ~0).
            target_accept_ratio=0.95,
            prior_temperature=(1.0, 1.0, 1.0),
            phi=hp[:, :2].T, sigma=np.array([0.2, 0.2]),  # fixed-sigma mode
            # Unimodal at default temperatures: the single-basin production
            # sampler (whitened multi-chain NUTS + pooled dense metric)
            # mixes far better than PT here (PT is config 6's job).
            sampler=("chees" if idx == 7 else "nuts"),
            n_chains=64, x_whitened=True,  # measured ESS/sec optimum (chain_sweep.jsonl)
            theta_constrained=True, chain_init_jitter=0.05,
            mass_matrix="dense-pooled", chunk_size=250,
        )
        res = magi.solve_magi(data["y_grid"], data["t_grid"], FN_SYSTEM, cfg)
        out = theta_metrics(res, FN_THETA_TRUE)
        if idx == 7:
            d = res.diagnostics
            out["trajectory_length"] = round(
                float(d.get("trajectory_length", np.nan)), 4
            )
    elif idx == 2:
        # Inferred-sigma recovery (BASELINE #2: "sigma sampled jointly in
        # the posterior") at the DEFAULT temperatures — the protocol the
        # reference's own E2E test asserts recovery on (test/runtests.jl:
        # 65-115). At the run_scripts beta=[1,1,5] the tempered posterior
        # is genuinely bimodal and ANY well-mixing sampler diffuses into
        # the sigma-inflated basin (measured: chains started at the GN
        # data-basin mode migrate within 3000 iterations; the reference's
        # raw chain only "recovers" there because it barely moves). The
        # [1,1,5] regime is config 6's full-posterior PT exploration.
        data = fn_data(seed)
        cfg = MagiConfig(
            niter_hmc=3000, step_size_factor=0.06, seed=seed,
            # 0.95 resolves the theta_b~0.48 curvature pocket (bench.py
            # production comment: 36x seed-7 ESS/s, divergences -> ~0).
            target_accept_ratio=0.95,
            prior_temperature=(1.0, 1.0, 1.0),
            sampler="nuts", n_chains=64, x_whitened=True,  # measured ESS/sec optimum (chain_sweep.jsonl)
            theta_constrained=True, chain_init_jitter=0.05,
            mass_matrix="dense-pooled", chunk_size=250,
        )
        res = magi.solve_magi(data["y_grid"], data["t_grid"], FN_SYSTEM, cfg)
        out = theta_metrics(res, FN_THETA_TRUE)
        sig = res.sigma.mean(axis=0)
        out["sigma_mean"] = [round(float(x), 4) for x in sig]
        out["sigma_rmse"] = round(float(np.sqrt(np.mean((sig - 0.2) ** 2))), 4)
    elif idx == 6:
        # Full-posterior exploration at the reference protocol: PT crosses
        # between the data and sigma-inflated basins (the honest tempered
        # posterior; recovery metrics vs the ODE truth are expected to look
        # "worse" because the posterior itself is multimodal at beta_obs=5).
        data = fn_data(seed)
        cfg = MagiConfig(
            niter_hmc=3000, step_size_factor=0.06, seed=seed,
            # 0.95 resolves the theta_b~0.48 curvature pocket (bench.py
            # production comment: 36x seed-7 ESS/s, divergences -> ~0).
            target_accept_ratio=0.95,
            prior_temperature=(1.0, 1.0, 5.0),
            sampler="pt-nuts", x_whitened=True, theta_constrained=True,
            pt_replicas=4, mass_matrix="dense-pooled",
            chunk_size=250,
        )
        res = magi.solve_magi(data["y_grid"], data["t_grid"], FN_SYSTEM, cfg)
        out = theta_metrics(res, FN_THETA_TRUE)
        sig = res.sigma.mean(axis=0)
        out["sigma_mean"] = [round(float(x), 4) for x in sig]
        out["sigma_rmse"] = round(float(np.sqrt(np.mean((sig - 0.2) ** 2))), 4)
        out.update(basin_metrics(res, FN_THETA_TRUE))
    elif idx == 3:
        from hes1_example import NOISE_SD, THETA_TRUE_FIXF, generate_data

        t_grid, y, x_truth = generate_data(seed=seed)
        cfg = MagiConfig(
            niter_hmc=8000, step_size_factor=0.05, seed=seed,
            sampler="pt-nuts", pt_temps=10, x_whitened=True,
            # Production knobs (round-5; VERDICT r4 item 3). r4 ran this
            # config at the 0.8 default + diag metric + 1 replica and it
            # mixed 5-50x worse than every other config (min ESS 193-568,
            # 164-253 divergences on two seeds, one rung's step size
            # collapsed to 0.00155):
            # - 0.95 resolves divergence flooding exactly as on FN (the
            #   adapted eps at 0.8 under-resolves the cold rung);
            # - 4 replicas = 4 independent cold chains (ESS sums) and a
            #   4x-better-conditioned pooled metric per rung;
            # - the pooled dense metric captures the theta/X curvature
            #   cross-terms the diag metric crawls along.
            target_accept_ratio=0.95,
            pt_replicas=4, mass_matrix="dense-pooled",
            phi=np.array([[2.0, 1.5, 12.0], [55.0, 55.0, 55.0]]),
            sigma=np.array([NOISE_SD] * 3),
            map_init_iterations=3000, map_init_lr=0.02,
            theta_constrained=True,
            chunk_size=500,  # bound device-call length (see config 2 note)
        )
        res = magi.solve_magi(y, t_grid, HES1LOG_FIXF_SYSTEM, cfg)
        out = theta_metrics(res, THETA_TRUE_FIXF)
        h_mean = res.x_sampled[:, :, 2].mean(axis=0)
        out["h_rmse"] = round(
            float(np.sqrt(np.mean((h_mean - x_truth[:, 2]) ** 2))), 4
        )
    elif idx == 4:
        # Dense discretization grids are a numerical-refinement knob (the
        # BASELINE spec: "banded covariance approximation on 4x-8x time
        # points") — exercised at the default temperatures where the
        # posterior is unimodal, with the production pooled-dense NUTS.
        # (At beta_obs=5 the posterior is multimodal regardless of grid
        # density — that regime is config 6.) Measured with the exact-
        # Hessian whitener: ESS 1466, R-hat 1.011, eps 7.9e-3 at n=793.
        data = fn_data(seed, fill=3)  # n = 793
        cfg = MagiConfig(
            niter_hmc=2000, step_size_factor=0.06, seed=seed,
            # 0.95 resolves the theta_b~0.48 curvature pocket (bench.py
            # production comment: 36x seed-7 ESS/s, divergences -> ~0).
            target_accept_ratio=0.95,
            prior_temperature=(1.0, 1.0, 1.0),
            sampler="nuts", n_chains=64, x_whitened=True,  # measured ESS/sec optimum (chain_sweep.jsonl)
            theta_constrained=True, chain_init_jitter=0.05,
            mass_matrix="dense-pooled",
            # n=793 executions are heavy; long single XLA executions have
            # crashed the remote TPU worker (it died 3x at chunk 250) —
            # keep each device call well under a minute.
            chunk_size=50,
        )
        res = magi.solve_magi(data["y_grid"], data["t_grid"], FN_SYSTEM, cfg)
        out = theta_metrics(res, FN_THETA_TRUE)
        out["n_grid"] = len(data["t_grid"])
        sig = res.sigma.mean(axis=0)
        out["sigma_mean"] = [round(float(x), 4) for x in sig]
    elif idx == 8:
        # Scale stress (round-5; VERDICT r4 item 7): filllevel-4 grid ->
        # n = 1585, past the regime every other config exercises. The
        # point is to run the auto band-impl policy where its branches
        # actually matter and record WHICH impl it picked (diagnostics
        # band_impl) alongside recovery + mixing. At n=1585 the (D,n,n)
        # dense stacks are ~120 MB and each batched grad eval carries 4x
        # config-4's matmul flops: chunk_size drops to 10 to keep single
        # device calls under the remote worker's crash threshold
        # (config-4 note: it died 3x at chunk 250 for n=793). Chains stay
        # at the config-4 production 64: a first 16-chain attempt
        # tree-saturated (ESS 35, R-hat 1.38 at 2k iters) because a
        # pooled DENSE metric at dim=3175 is rank-starved from 16 chains'
        # window draws — metric quality, not arithmetic, is the scaling
        # constraint here.
        data = fn_data(seed, fill=4)  # n = 1585
        cfg = MagiConfig(
            niter_hmc=2000, step_size_factor=0.06, seed=seed,
            target_accept_ratio=0.95,
            prior_temperature=(1.0, 1.0, 1.0),
            sampler="nuts", n_chains=64, x_whitened=True,
            theta_constrained=True, chain_init_jitter=0.05,
            mass_matrix="dense-pooled",
            chunk_size=10,
        )
        res = magi.solve_magi(data["y_grid"], data["t_grid"], FN_SYSTEM, cfg)
        out = theta_metrics(res, FN_THETA_TRUE)
        out["n_grid"] = len(data["t_grid"])
        out["band_impl"] = res.diagnostics.get("band_impl")
        out["bandsize"] = res.diagnostics.get("bandsize")
        sig = res.sigma.mean(axis=0)
        out["sigma_mean"] = [round(float(x), 4) for x in sig]
    elif idx == 5:
        # BASELINE.json config 5 exercises the multichain NUTS machinery
        # (vmapped chains, dual-averaging warmup, split-R-hat/ESS) — run it
        # at default temperatures, where the posterior is unimodal and
        # independent chains are expected to agree. (At beta_obs=5 the
        # tempered posterior is genuinely multimodal and single raw chains
        # cannot cross basins — that regime is config 2's job, via PT.)
        data = fn_data(seed)
        cfg = MagiConfig(
            niter_hmc=2000, step_size_factor=0.06, seed=seed,
            # 0.95 resolves the theta_b~0.48 curvature pocket (bench.py
            # production comment: 36x seed-7 ESS/s, divergences -> ~0).
            target_accept_ratio=0.95,
            prior_temperature=(1.0, 1.0, 1.0),
            sampler="nuts", n_chains=64, x_whitened=True,  # measured ESS/sec optimum (chain_sweep.jsonl)
            # Whitened coordinates have ~unit posterior scale: 0.05-sd
            # dispersion overdisperses enough for split-R-hat while staying
            # on the manifold (0.5 strands chains ~14 Mahalanobis units
            # off it -> frozen chains, R-hat ~1e3; measured).
            theta_constrained=True, chain_init_jitter=0.05,
            # Cross-chain pooled dense metric: the diag metric crawls along
            # the theta_b ridge (ESS = n_chains, R-hat in the hundreds;
            # measured — see BENCHMARKS.md config-5 diagnosis).
            mass_matrix="dense-pooled",
        )
        res = magi.solve_magi(data["y_grid"], data["t_grid"], FN_SYSTEM, cfg)
        out = theta_metrics(res, FN_THETA_TRUE)
        out["n_chains"] = 64
        sig = res.sigma.mean(axis=0)
        out["sigma_mean"] = [round(float(x), 4) for x in sig]
    else:
        raise ValueError(idx)

    dt = time.perf_counter() - t0
    out["time_s"] = round(dt, 1)
    out["ess_per_sec"] = round(out["ess_min"] / dt, 3)
    d = res.diagnostics
    out["grad_evals"] = float(d["gradient_evals"])
    # Sampler-health extras (frozen-chain / collapsed-step-size forensics).
    if "accept_prob" in d:
        out["accept_mean"] = round(float(np.mean(d["accept_prob"])), 3)
    if "step_size" in d:
        eps = np.atleast_1d(np.asarray(d["step_size"], dtype=np.float64))
        out["step_size_med"] = float(f"{np.median(eps):.3g}")
        out["step_size_min"] = float(f"{np.min(eps):.3g}")
    if "tree_depth" in d:
        out["tree_depth_mean"] = round(float(np.mean(d["tree_depth"])), 2)
    if "n_divergent" in d:
        out["n_divergent"] = int(d["n_divergent"])
    if "swap_acceptance" in d:
        out["swap_acceptance"] = round(float(d["swap_acceptance"]), 3)
        out["swap_acceptance_per_pair"] = [
            round(float(x), 3)
            for x in np.atleast_1d(d.get("swap_acceptance_per_pair", []))
        ]
    out["config"] = idx
    out["seed"] = seed
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1,2,3,4,5,6")
    ap.add_argument("--seeds", default="42,7,123")
    ap.add_argument("--out", default="benchmarks/results_r2.jsonl")
    args = ap.parse_args()

    configs = [int(c) for c in args.configs.split(",")]
    seeds = [int(s) for s in args.seeds.split(",")]
    # Relay-outage resilience (same policy as bench.py): wait out a down
    # backend before each run and retry a run the relay dropped mid-flight,
    # so one transient outage doesn't poison the sweep artifact.
    import bench

    max_wait = float(os.environ.get("MAGI_BACKEND_MAX_WAIT_S", 900))
    poll = float(os.environ.get("MAGI_BACKEND_POLL_S", 60))
    for idx in configs:
        for seed in seeds:
            log(f"=== config {idx}, seed {seed} ===")
            bench.wait_for_backend(max_wait_s=max_wait, poll_s=poll)
            try:
                out = bench._retry_on_outage(
                    run_config, idx, seed, stage=f"config{idx}/seed{seed}"
                )
            except Exception as e:  # keep the sweep alive
                out = {
                    "config": idx, "seed": seed,
                    "error": f"{type(e).__name__}: {e}",
                }
            log(json.dumps(out))
            with open(args.out, "a") as f:
                f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
