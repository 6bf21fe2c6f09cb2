"""Lockstep decomposition of the sampler-machinery gap (VERDICT r4 #1).

The per-layer probe (nuts_overhead_probe.py) bounds the raw fused
value+grad at ~1.8M evals/s at the production shape while E2E NUTS
extracts ~363k USEFUL grad evals/s (round-5, 128 hand-batched chains).
This probe proves where the remainder lives by separating the two
fundamentally different costs:

  useful leaves   sum_{c,s} num_leapfrog[c,s] — leapfrog steps whose
                  gradients advance some chain's trajectory.
  paid leaves     C * sum_s (2^{max_c depth[c,s]} - 1) — leapfrog steps
                  the lockstep program EXECUTES: every batched step runs
                  all C lanes, and the transition's doubling loop runs
                  until the DEEPEST chain finishes
                  (inference/nuts_batched.py _build_subtree_b: the inner
                  while_loop advances masked lanes until num_leaves
                  steps; the outer loop doubles until all chains done).

The lockstep factor paid/useful is a timing-free property of the
tree-depth variance across chains at this posterior + adapted step size.
It is IRREDUCIBLE for any lockstep (SIMD-batched) NUTS: shrinking it
requires per-chain async execution, which forfeits the MXU batching that
makes the chip fast in the first place (utilization_study.py: batch-1 is
latency-bound at 0.05% MFU).

paid_rate = paid / sampling_time is the device rate at which the batched
program actually steps leapfrogs (including masked lanes). Comparing it
against the chained whitened-vg bound at the same batch
(`nuts_overhead_probe.py --batch C`, the "+ whitening" row) bounds the
residual NON-lockstep machinery overhead (tree bookkeeping, metric
products, adaptation, host chunk turnaround). sampling_time here
includes warmup wall (solve.py t_sample), so paid_rate UNDERestimates
the device rate — the residual-overhead estimate is an upper bound.

Usage (TPU, default env):
    python -u benchmarks/lockstep_decomposition.py [--seed 42]
        [--chains 128] [--iters 3000] [--raw-rate EVALS_PER_S]
        [--out benchmarks/lockstep_decomposition.json]

--raw-rate: the chained whitened-centered vg rate at this batch from
`nuts_overhead_probe.py --batch <chains>`; when given, the residual
machinery overhead factor is reported.
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


def decompose(leaves: np.ndarray, depth: np.ndarray) -> dict:
    """Timing-free lockstep arithmetic from (C, S) tree stats."""
    C, S = leaves.shape
    useful = float(leaves.sum())
    max_depth_s = depth.max(axis=0)                      # (S,)
    paid_per_iter = 2.0 ** max_depth_s - 1.0             # batched steps
    paid = float(C * paid_per_iter.sum())
    return {
        "n_chains": int(C),
        "n_kept_draws": int(S),
        "useful_leaves": useful,
        "paid_leaves": paid,
        "lockstep_factor": paid / useful,
        "mean_tree_depth": float(depth.mean()),
        "mean_max_tree_depth": float(max_depth_s.mean()),
        # how often the deepest chain sets a depth the MEDIAN chain
        # doesn't reach — the per-iteration depth spread driving the factor
        "median_tree_depth": float(np.median(depth)),
        "p95_max_depth": float(np.quantile(max_depth_s, 0.95)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--chains", type=int, default=bench.N_CHAINS)
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--raw-rate", type=float, default=None,
                    help="chained whitened vg evals/s at this batch "
                         "(nuts_overhead_probe.py --batch <chains>)")
    ap.add_argument("--out", default="benchmarks/lockstep_decomposition.json")
    args = ap.parse_args()

    bench.wait_for_backend(
        max_wait_s=float(os.environ.get("MAGI_BACKEND_MAX_WAIT_S", 900)),
        poll_s=float(os.environ.get("MAGI_BACKEND_POLL_S", 60)),
    )
    _, _, host = bench.build_workload()
    diag: dict = {}
    row = bench.bench_production(
        host, n_iters=args.iters, seed=args.seed, n_chains=args.chains,
        diag_out=diag,
    )
    out = decompose(diag["num_leapfrog"], diag["tree_depth"])
    out["seed"] = args.seed
    # Rates on the bench convention (sampling_time includes warmup wall,
    # so both are lower bounds on the post-warmup device rate).
    out["sampling_time_s"] = row["sampling_time_s"]
    out["useful_rate_evals_per_s"] = out["useful_leaves"] / row[
        "sampling_time_s"
    ]
    out["paid_rate_evals_per_s"] = out["paid_leaves"] / row[
        "sampling_time_s"
    ]
    if args.raw_rate:
        out["raw_whitened_vg_rate"] = args.raw_rate
        # >1: machinery/dispatch cost beyond pure leapfrog arithmetic.
        out["residual_machinery_factor"] = (
            args.raw_rate / out["paid_rate_evals_per_s"]
        )
    out["divergences"] = row["divergences"]
    out["ess_per_sec"] = row["ess_per_sec"]
    log(json.dumps(out, indent=2))
    with open(args.out, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
