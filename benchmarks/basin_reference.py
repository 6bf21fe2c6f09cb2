"""Trusted long-run reference for config 6's basin occupancy.

Config 6 (PT at the reference run_scripts protocol beta=[1,1,5]) reports
the fraction of cold-chain mass in the data basin (max sigma < 0.3). Is
that number the TRUE posterior mass split, or an artifact of hot-rung
teleportation over-escaping the data basin? This script answers it on the
same workload family at reduced n (fill=1 -> n=199, CPU f64 — affordable
for a 10x-iteration gold run):

  arm A  production PT config (pt_replicas x 3000 iterations) — the
         config-6 protocol, just at n=199;
  arm B  gold PT run: 10x iterations, double rungs, f64 — long enough
         that occupancy has converged (SE ~ sqrt(p(1-p)/ESS) reported,
         plus replica-level agreement as the trust check).

If A's occupancy falls within a few SE of B's, the config-6 machinery is
validated: the occupancy it reports at n=397 is posterior mass, not
sampler artifact.

Run (CPU, f64 — takes ~0.5-1.5h for the gold arm):
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -u \
        benchmarks/basin_reference.py [--seed 42] [--out benchmarks/basin_reference.jsonl]
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
from manifold_constrained_gaussian_process_inference_tpu.models import FN_SYSTEM

FN_THETA_TRUE = np.array([0.2, 0.2, 3.0])


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_arm(tag, seed, niter, replicas, temps, chunk):
    from run_baseline_configs import basin_metrics, fn_data, theta_metrics

    data = fn_data(seed, fill=1)  # n = 199
    cfg = MagiConfig(
        niter_hmc=niter, step_size_factor=0.06, seed=seed,
        prior_temperature=(1.0, 1.0, 5.0),
        sampler="pt-nuts", x_whitened=True, theta_constrained=True,
        pt_replicas=replicas, pt_temps=temps,
        mass_matrix="dense-pooled", chunk_size=chunk,
    )
    t0 = time.perf_counter()
    res = magi.solve_magi(data["y_grid"], data["t_grid"], FN_SYSTEM, cfg)
    out = theta_metrics(res, FN_THETA_TRUE)
    out.update(basin_metrics(res, FN_THETA_TRUE))
    out["arm"] = tag
    out["seed"] = seed
    out["n_grid"] = len(data["t_grid"])
    out["niter"] = niter
    out["pt_replicas"] = replicas
    out["pt_temps"] = temps
    out["time_s"] = round(time.perf_counter() - t0, 1)
    d = res.diagnostics
    out["swap_acceptance"] = round(float(d.get("swap_acceptance", 0.0)), 3)
    # Per-replica occupancy: agreement across INDEPENDENT ladders is the
    # trust check for the gold arm (teleportation artifacts would have to
    # reproduce across replicas with separate ladders and keys).
    tpc = d["theta_per_chain"]
    c, s, _ = tpc.shape
    sig_max = res.sigma.max(axis=1).reshape(c, s)
    out["frac_data_basin_per_replica"] = [
        round(float(m), 3) for m in (sig_max < 0.3).mean(axis=1)
    ]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", default="benchmarks/basin_reference.jsonl")
    ap.add_argument("--quick", action="store_true",
                    help="tiny lengths; smoke-test the harness only")
    args = ap.parse_args()

    arms = (
        [("production", 600, 2, 8, 300), ("gold", 1500, 2, 10, 300)]
        if args.quick
        else [
            # production protocol at n=199 (config-6 shape, reduced n)
            ("production", 3000, 4, 8, 500),
            # gold: 10x iterations, more rungs, 4 independent ladders
            ("gold", 30000, 4, 12, 1000),
        ]
    )
    for tag, niter, reps, temps, chunk in arms:
        log(f"=== arm {tag}: {niter} iters x {reps} replicas, "
            f"{temps} rungs ===")
        out = run_arm(tag, args.seed, niter, reps, temps, chunk)
        log(json.dumps(out))
        with open(args.out, "a") as f:
            f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
