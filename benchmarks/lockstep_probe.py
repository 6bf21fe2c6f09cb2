"""Decompose the E2E NUTS machinery gap at the production point.

Round-4 measured: raw fused value+grad 1.82M evals/s (35 us per batched
step of 64 chains), whitened 1.34M (47.8 us), but E2E NUTS extracts only
~113-126k committed grad evals/s (~530 us per committed batched leaf) —
a ~11x residue attributed to "tree machinery + metric products + lockstep
while_loop" without a split. This probe produces the split from a REAL
production run's per-draw statistics:

  Under vmap, both NUTS while_loops run until EVERY chain's cond is
  false, so one draw costs (2^Dmax - 1) batched leaf-iterations where
  Dmax = max tree depth over the 64 chains — regardless of how few
  leaves the other chains commit.

  lockstep_inflation = C * sum_draws(2^Dmax - 1) / sum(num_leapfrog)
      (leaf-slots the SIMD batch executes per committed leaf)
  batched_iter_cost_us = sampling_wall / sum_draws(2^Dmax - 1)
      (what one lockstep leaf-iteration actually costs, bookkeeping
       included; compare against the 47.8 us whitened-vg floor)

The product of the two (relative to the whitened-vg floor) reconstructs
the E2E gap; whichever factor dominates is the optimization target.

Usage (TPU): python -u benchmarks/lockstep_probe.py [--seed 42] [--niter 2000]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--niter", type=int, default=2000)
    ap.add_argument("--n-chains", type=int, default=64)
    args = ap.parse_args()

    import bench
    from manifold_constrained_gaussian_process_inference_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    bench.wait_for_backend(
        max_wait_s=float(os.environ.get("MAGI_BACKEND_MAX_WAIT_S", 900)),
        poll_s=float(os.environ.get("MAGI_BACKEND_POLL_S", 60)),
    )

    target, psi0, host = bench.build_workload(seed=args.seed)
    from manifold_constrained_gaussian_process_inference_tpu import solve_magi
    from manifold_constrained_gaussian_process_inference_tpu.config import (
        MagiConfig,
    )
    from manifold_constrained_gaussian_process_inference_tpu.models import (
        FN_SYSTEM,
    )

    config = MagiConfig(
        niter_hmc=args.niter,
        burnin_ratio=0.5,
        step_size_factor=0.06,
        prior_temperature=bench.BETA,
        sampler="nuts",
        n_chains=args.n_chains,
        mass_matrix="dense-pooled",
        chain_init_jitter=0.05,
        x_whitened=True,
        theta_constrained=True,
        target_accept_ratio=0.95,
        seed=args.seed,
        chunk_size=250,
    )
    t0 = time.perf_counter()
    res = solve_magi(host["y"], host["t"], FN_SYSTEM, config)
    wall = time.perf_counter() - t0
    d = res.diagnostics
    depth = np.asarray(d["tree_depth"])        # (C, S)
    leaps = np.asarray(d["num_leapfrog"])      # (C, S)
    C, S = depth.shape
    sampling_s = float(d["sampling_time_s"])

    dmax = depth.max(axis=0)                   # (S,)
    iters_per_draw = (2.0 ** dmax) - 1.0       # batched leaf-iterations
    total_iters = float(iters_per_draw.sum())
    committed = float(leaps.sum())
    slots = C * total_iters
    inflation = slots / committed

    batched_iter_us = 1e6 * sampling_s / total_iters
    committed_leaf_us = 1e6 * sampling_s / committed * C
    # the round-4 whitened-vg floor at this shape (docs/BENCHMARKS.md)
    WHITENED_VG_US = 47.8
    bookkeeping_x = batched_iter_us / WHITENED_VG_US

    out = {
        "seed": args.seed,
        "n_chains": C,
        "draws": S,
        "sampling_s": round(sampling_s, 2),
        "total_wall_s": round(wall, 2),
        "mean_depth": round(float(depth.mean()), 2),
        "p50_depth": int(np.median(depth)),
        "mean_dmax_over_chains": round(float(dmax.mean()), 2),
        "committed_leaves": committed,
        "lockstep_leaf_iterations": total_iters,
        "lockstep_inflation": round(inflation, 2),
        "batched_iter_cost_us": round(batched_iter_us, 1),
        "bookkeeping_x_vs_whitened_vg": round(bookkeeping_x, 2),
        "per_committed_leaf_us": round(committed_leaf_us, 1),
        "grad_evals_per_sec_sampling": round(committed / sampling_s, 1),
        "divergences": int(d["n_divergent"]),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
