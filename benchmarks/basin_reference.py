"""Config-6 occupancy validation: trusted long-run reference vs production.

VERDICT r2 item 6: the basin occupancy reported by config 6 (full-posterior
PT at the reference protocol beta=[1,1,5], run_scripts/fn_example.jl:34-43)
must be validated against a TRUSTED long-run reference — otherwise a
measured occupancy could be hot-rung-driven over-escape rather than the
correct posterior mass split.

Protocol (both arms at the SAME reduced grid so they target the SAME
posterior; the full-grid production numbers live in results_r3.jsonl):

- ``--mode trusted``: CPU float64 parallel tempering with 10x the
  production iteration budget (default 30000). Float64 removes the f32
  noise-floor as a confounder; the long budget gives the basin indicator
  a large ESS so the occupancy standard error is tight.
- ``--mode production``: the exact config-6 recipe (f32, TPU default env,
  3000 iterations) at the same grid.

Each run appends one JSON line to ``--out`` with frac_data_basin (+ its
autocorrelation-aware SE), basin-conditional recovery, and sampler health.
Agreement within ~2 combined SEs validates the production occupancy as
posterior mass, not sampler artifact.

Usage:
    # trusted arm (forces CPU f64 in-process; run with default env)
    python -u benchmarks/basin_reference.py --mode trusted --seeds 42,7
    # production arm (TPU default env)
    python -u benchmarks/basin_reference.py --mode production --seeds 42,7
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["trusted", "production"],
                    required=True)
    ap.add_argument("--fill", type=int, default=1,
                    help="filllevel (1 -> n=199; config 6 proper uses 2)")
    ap.add_argument("--niter", type=int, default=None,
                    help="HMC iterations (default: 30000 trusted, "
                         "3000 production)")
    ap.add_argument("--seeds", default="42,7")
    ap.add_argument("--out", default="benchmarks/basin_reference.jsonl")
    args = ap.parse_args()

    if args.mode == "trusted":
        # In-process CPU+x64 override (sitecustomize has already imported
        # jax with JAX_PLATFORMS=axon; config.update still works pre-init —
        # same pattern as tests/conftest.py).
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    niter = args.niter or (30000 if args.mode == "trusted" else 3000)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import numpy as np

    import manifold_constrained_gaussian_process_inference_tpu as magi
    from manifold_constrained_gaussian_process_inference_tpu.config import (
        MagiConfig,
    )
    from manifold_constrained_gaussian_process_inference_tpu.models import (
        FN_SYSTEM,
    )
    from run_baseline_configs import (
        FN_THETA_TRUE,
        basin_metrics,
        fn_data,
        log,
        theta_metrics,
    )

    for seed in [int(s) for s in args.seeds.split(",")]:
        log(f"=== basin_reference mode={args.mode} fill={args.fill} "
            f"niter={niter} seed={seed} ===")
        t0 = time.perf_counter()
        data = fn_data(seed, fill=args.fill)
        cfg = MagiConfig(
            niter_hmc=niter, step_size_factor=0.06, seed=seed,
            target_accept_ratio=0.95,
            prior_temperature=(1.0, 1.0, 5.0),
            sampler="pt-nuts", x_whitened=True, theta_constrained=True,
            # trusted: fewer replicas, far more iterations per replica —
            # occupancy error is driven by per-chain autocorrelation, and
            # long chains also expose slow inter-basin dynamics that many
            # short replicas can hide.
            pt_replicas=(2 if args.mode == "trusted" else 4),
            mass_matrix="dense-pooled",
            chunk_size=(500 if args.mode == "trusted" else 250),
        )
        try:
            res = magi.solve_magi(data["y_grid"], data["t_grid"],
                                  FN_SYSTEM, cfg)
            out = theta_metrics(res, FN_THETA_TRUE)
            out.update(basin_metrics(res, FN_THETA_TRUE))
            sig = res.sigma.mean(axis=0)
            out["sigma_mean"] = [round(float(x), 4) for x in sig]
            d = res.diagnostics
            out["grad_evals"] = float(d["gradient_evals"])
            if "swap_acceptance" in d:
                out["swap_acceptance"] = round(
                    float(d["swap_acceptance"]), 3
                )
            if "n_divergent" in d:
                out["n_divergent"] = int(d["n_divergent"])
        except Exception as e:  # keep the sweep alive
            out = {"error": f"{type(e).__name__}: {e}"}
        out.update(
            mode=args.mode, fill=args.fill, niter=niter, seed=seed,
            pt_replicas=cfg.pt_replicas,
            n_grid=len(data["t_grid"]),
            time_s=round(time.perf_counter() - t0, 1),
        )
        log(json.dumps(out))
        with open(args.out, "a") as f:
            f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
