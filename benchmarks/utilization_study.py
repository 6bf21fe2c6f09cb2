"""Single-chip utilization study (VERDICT r1 item 10).

The MAGI hot path is a chain of banded/dense matvecs with a sequential
leapfrog data dependence — latency/HBM-bound, not FLOP-bound. This script
quantifies that: for the dense and band/Pallas execution paths at
n in {397, 793, 3169} and chain batch sizes {1, 4, 16, 64}, measure fused
value+grad evals/sec and convert to achieved FLOP/s and HBM bytes/s using
an analytic per-eval cost model, vs the v5e peaks (197 TF/s bf16-class
matmul, ~819 GB/s HBM).

Cost model per eval (D dims, n grid points, band b):
  dense path: ~6 (n x n) matvecs per dim (mphi x, factor forms of Kinv/Cinv
  quadratics and their adjoints) -> flops ~= D * 6 * 2 n^2,
  unique matrix bytes ~= D * 4 * n^2 * 4 (C/K factors + mphi + transpose
  reuse) fetched once per BATCHED step (amortized over the chain batch).
  band path: n x (2b+1) per matvec -> flops ~= D * 6 * 2 n (2b+1),
  bytes ~= D * 4 * n (2b+1) * 4.

Usage (TPU): python -u benchmarks/utilization_study.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

V5E_PEAK_FLOPS = 197e12
V5E_PEAK_HBM = 819e9


def build(n_obs, fill, band_impl, dtype=None):
    import bench

    target, psi0, host = bench.build_workload(n_obs=n_obs, fill=fill)
    if band_impl != "dense":
        from manifold_constrained_gaussian_process_inference_tpu.inference.target import (
            MagiTarget,
        )
        from manifold_constrained_gaussian_process_inference_tpu.models import (
            FN_SYSTEM,
        )

        target = MagiTarget.build(
            host["y"], host["cov"], FN_SYSTEM,
            sigma_init=np.array([0.2, 0.2]),
            prior_temperature=np.array(bench.BETA), sigma_is_fixed=False,
            band_impl=band_impl,
        )
    return target, psi0, host


def measure(target, psi0, batch, n_evals=2000):
    import jax
    import jax.numpy as jnp

    dtype = target.data.mask.dtype
    vg = target.value_and_grad_fn()
    vg_b = jax.vmap(vg) if batch > 1 else vg
    psi = jnp.asarray(
        np.tile(psi0, (batch, 1)) if batch > 1 else psi0, dtype
    )

    @jax.jit
    def chained(p, n):
        def body(_, p):
            v, g = vg_b(p)
            scale = 1.0 + jnp.mean(jnp.abs(v))
            return p + 1e-6 * g / scale

        return jax.lax.fori_loop(0, n, body, p)

    chained(psi, 2).block_until_ready()
    t0 = time.perf_counter()
    chained(psi, n_evals).block_until_ready()
    dt = time.perf_counter() - t0
    return n_evals * batch / dt  # evals/s (per-chain evals aggregated)


def main():
    d = 2
    rows = []
    for n_obs, fill in [(100, 2), (100, 3), (100, 5)]:
        n = (100 - 1) * 2**fill + 1
        for band_impl in ("dense", "pallas"):
            if band_impl == "dense" and n > 1600:
                continue  # dense at n=3169 is known-slow; skip to save time
            try:
                target, psi0, host = build(n_obs, fill, band_impl)
            except Exception as e:
                print(f"n={n} {band_impl}: build failed {type(e).__name__}: {e}",
                      flush=True)
                continue
            b = host["cov"].bandsize
            for batch in (1, 4, 16, 64):
                try:
                    rate = measure(target, psi0, batch)
                except Exception as e:
                    print(f"n={n} {band_impl} batch={batch}: {type(e).__name__}",
                          flush=True)
                    continue
                if band_impl == "dense":
                    flops_per_eval = d * 6 * 2 * n * n
                    bytes_per_step = d * 4 * n * n * 4
                else:
                    flops_per_eval = d * 6 * 2 * n * (2 * b + 1)
                    bytes_per_step = d * 4 * n * (2 * b + 1) * 4
                flops = rate * flops_per_eval
                # matrices are fetched once per batched step
                hbm = (rate / batch) * bytes_per_step
                rows.append(dict(
                    n=n, impl=band_impl, band=b, batch=batch,
                    evals_per_sec=round(rate, 1),
                    gflops=round(flops / 1e9, 1),
                    mfu_pct=round(100 * flops / V5E_PEAK_FLOPS, 4),
                    hbm_gbs=round(hbm / 1e9, 1),
                    hbm_pct=round(100 * hbm / V5E_PEAK_HBM, 1),
                ))
                print(rows[-1], flush=True)
    print("\n| n | impl | band | batch | evals/s | GFLOP/s | MFU% | HBM GB/s | HBM% |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['n']} | {r['impl']} | {r['band']} | {r['batch']} | "
              f"{r['evals_per_sec']:,} | {r['gflops']} | {r['mfu_pct']} | "
              f"{r['hbm_gbs']} | {r['hbm_pct']} |")


if __name__ == "__main__":
    main()
