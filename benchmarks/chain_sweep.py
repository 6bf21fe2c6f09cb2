"""Chain-count sweep on the headline production workload (VERDICT r2
item 10 / utilization follow-through).

The single-chip utilization study measured the batched value+grad sweet
spot at batch >= 64 (63% of peak HBM at n=793, 26% at n=397) — but raw
eval throughput is not the headline metric: more chains divide the same
per-chain ESS over a longer wall-clock iteration AND improve the pooled
dense metric estimate. This sweep measures what the headline actually
pays for — min-theta ESS/sec — at n_chains in {16, 32, 64}, same seeds as
bench.py's production stage. bench.N_CHAINS records the winner.

Run (TPU, default env):
    python -u benchmarks/chain_sweep.py [--chains 16,32,64] [--seeds 42,123]
        [--out benchmarks/chain_sweep.jsonl]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", default="16,32,64")
    ap.add_argument("--seeds", default="42,123")
    ap.add_argument("--out", default="benchmarks/chain_sweep.jsonl")
    ap.add_argument(
        "--step_jitter", type=float, default=bench.STEP_JITTER,
        help="post-warmup shared step-size jitter probability "
             "(0 = off; see parallel/chains.py)",
    )
    ap.add_argument(
        "--envelope", action="store_true",
        help="divergence-informed curvature envelope "
             "(config.divergence_envelope; parallel/chains.py)",
    )
    args = ap.parse_args()

    _, _, host = bench.build_workload()
    for c in [int(x) for x in args.chains.split(",")]:
        for seed in [int(s) for s in args.seeds.split(",")]:
            log(f"=== n_chains={c}, seed={seed} ===")
            try:
                out = bench.bench_production(
                    host, seed=seed, n_chains=c,
                    step_jitter=args.step_jitter,
                    envelope=args.envelope,
                )
                out = {k: v for k, v in out.items()
                       if k not in ("theta_mean", "sigma_mean")}
            except Exception as e:
                out = {"error": f"{type(e).__name__}: {e}"}
            out["n_chains"] = c
            out["seed"] = seed
            out["step_jitter"] = args.step_jitter
            out["envelope"] = bool(args.envelope)
            log(json.dumps(out))
            with open(args.out, "a") as f:
                f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
