"""Per-layer throughput probe at the production operating point.

The utilization study (utilization_study.py) measures the RAW value+grad
chained on itself — an idealized roofline. The production sampler stacks
three more layers on each leapfrog leaf: the whitening transform (W fwd +
W^T bwd, HIGHEST precision), the dense-pooled metric products, and the
NUTS tree machinery (lockstep vmapped while_loops + bookkeeping selects).
This probe measures each layer at the production shape (FN, n=397, D=2,
batch 64, centered whitened vg) so optimization work can be aimed at the
layer that actually dominates:

  1. raw vg chain          (utilization_study's number, for continuity)
  2. whitened-centered vg  (adds the W matmuls — the production target)
  3. chained nuts_transition under a dense metric (full per-leaf cost,
     fixed step size, no adaptation) -> leaves/sec
  4. the raw vg with operator stacks zero-padded n=397 -> 512 (lane-tile
     multiple): if the padded per-step time is not larger, the 397-shape
     inefficiency is tile padding XLA already pays, and explicit grid
     padding in solve would buy nothing; if padded is FASTER per step,
     padding the time grid is a real lever (VERDICT r3 item 3a).

Usage (TPU): python -u benchmarks/nuts_overhead_probe.py [--batch 64]
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--n-evals", type=int, default=2000)
    ap.add_argument("--n-transitions", type=int, default=50)
    ap.add_argument("--fill", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench

    bench.wait_for_backend(
        max_wait_s=float(os.environ.get("MAGI_BACKEND_MAX_WAIT_S", 900)),
        poll_s=float(os.environ.get("MAGI_BACKEND_POLL_S", 60)),
    )
    from manifold_constrained_gaussian_process_inference_tpu.inference.nuts import (
        DenseMetric,
        nuts_transition,
    )
    from manifold_constrained_gaussian_process_inference_tpu.inference.whiten import (
        build_psi_whitener,
        make_centered_whitened_vg,
    )

    target, psi0, host = bench.build_workload(fill=args.fill)
    dtype = target.data.mask.dtype
    batch = args.batch
    print(f"devices={jax.devices()} n_grid={target.n_times} batch={batch}",
          flush=True)

    def chain_rate(vg_b, x0, n_evals, tag):
        @jax.jit
        def chained(p, n):
            def body(_, p):
                v, g = vg_b(p)
                scale = 1.0 + jnp.mean(jnp.abs(v))
                return p + 1e-6 * g / scale

            return jax.lax.fori_loop(0, n, body, p)

        chained(x0, 2).block_until_ready()
        t0 = time.perf_counter()
        chained(x0, n_evals).block_until_ready()
        dt = time.perf_counter() - t0
        rate = n_evals * batch / dt
        print(json.dumps({"layer": tag, "evals_per_sec": round(rate, 1),
                          "us_per_step": round(1e6 * dt / n_evals, 2)}),
              flush=True)
        return rate

    # --- 1. raw vg ---
    vg_raw = jax.vmap(target.value_and_grad_fn())
    psi_b = jnp.asarray(np.tile(psi0, (batch, 1)), dtype)
    chain_rate(vg_raw, psi_b, args.n_evals, "raw_vg")

    # --- 2. centered whitened vg (the production target) ---
    # GN whitener: at n=397 it agrees with the exact-Hessian build (see
    # build_psi_whitener_exact docstring) and the probe only measures the
    # SHAPE cost of the W matmuls, not the whitening quality.
    whitener = build_psi_whitener(
        host["cov"], host["y"], target, np.asarray(psi0),
        np.asarray(bench.BETA), dtype,
    )
    vg_w = jax.vmap(make_centered_whitened_vg(target, whitener))
    dim = int(whitener.W.shape[0])
    z_b = jnp.zeros((batch, dim), dtype)
    chain_rate(vg_w, z_b, args.n_evals, "whitened_vg")

    # --- 3. full NUTS transition chain under a dense metric ---
    minv = jnp.eye(dim, dtype=dtype)
    metric = DenseMetric(minv=minv, chol_minv=minv)
    vg_single = make_centered_whitened_vg(target, whitener)
    eps = jnp.asarray(0.01, dtype)

    def one_chain_transitions(q0, key, n):
        logp0, grad0 = vg_single(q0)

        def body(carry, _):
            q, logp, grad, key = carry
            key, k = jax.random.split(key)
            q, logp, grad, stats = nuts_transition(
                vg_single, q, logp, grad, k, eps, metric, max_depth=6,
            )
            return (q, logp, grad, key), stats.num_leapfrog

        (_, _, _, _), leaves = jax.lax.scan(
            body, (q0, logp0, grad0, key), None, length=n
        )
        return leaves

    run = jax.jit(
        jax.vmap(lambda q, k: one_chain_transitions(q, k, args.n_transitions)),
        static_argnums=(),
    )
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    leaves = run(z_b, keys)
    leaves.block_until_ready()
    t0 = time.perf_counter()
    leaves = run(z_b, keys)
    total_leaves = float(jnp.sum(leaves))
    dt = time.perf_counter() - t0
    print(json.dumps({
        "layer": "nuts_dense_metric",
        "leaves_per_sec": round(total_leaves / dt, 1),
        "mean_leaves_per_transition": round(
            total_leaves / (batch * args.n_transitions), 1
        ),
        "wall_s": round(dt, 2),
    }), flush=True)

    # --- 4. raw vg with stacks zero-padded to the next lane multiple ---
    from manifold_constrained_gaussian_process_inference_tpu.ops.likelihood import (
        LikelihoodData,
        log_posterior,
    )
    from manifold_constrained_gaussian_process_inference_tpu.models import (
        FN_SYSTEM,
    )

    data = target.data
    n, d = data.mask.shape
    n_pad = -(-n // 128) * 128  # 397 -> 512

    def padm(a):  # (D, n, n) -> (D, n_pad, n_pad)
        out = np.zeros((a.shape[0], n_pad, n_pad), np.asarray(a).dtype)
        out[:, :n, :n] = np.asarray(a)
        return jnp.asarray(out)

    def padv(a):  # (n, D) -> (n_pad, D)
        out = np.zeros((n_pad, a.shape[1]), np.asarray(a).dtype)
        out[:n] = np.asarray(a)
        return jnp.asarray(out)

    tvec_pad = np.zeros(n_pad, np.asarray(data.tvec).dtype)
    tvec_pad[:n] = np.asarray(data.tvec)
    data_pad = LikelihoodData(
        yobs_filled=padv(data.yobs_filled), mask=padv(data.mask),
        nobs=data.nobs, tvec=jnp.asarray(tvec_pad),
        GKt=padm(data.GKt), mphi_gct=padm(data.mphi_gct),
        beta=data.beta, mu=padv(data.mu), dotmu=padv(data.dotmu),
    )
    sigma0 = jnp.asarray([0.2, 0.2], dtype)
    theta0 = jnp.asarray([0.2, 0.2, 3.0], dtype)

    for tag, dd, nn in ((f"raw_vg_n{n}_xonly", data, n),
                        (f"raw_vg_pad{n_pad}_xonly", data_pad, n_pad)):
        def value(x, _dd=dd):
            return log_posterior(x, theta0, sigma0, _dd, FN_SYSTEM.f)

        vgx = jax.vmap(jax.value_and_grad(value))
        x0 = jnp.zeros((batch, nn, d), dtype)

        @jax.jit
        def chained_x(x, n_it):
            def body(_, x):
                v, g = vgx(x)
                return x + 1e-6 * g / (1.0 + jnp.mean(jnp.abs(v)))

            return jax.lax.fori_loop(0, n_it, body, x)

        chained_x(x0, 2).block_until_ready()
        t0 = time.perf_counter()
        chained_x(x0, args.n_evals).block_until_ready()
        dt = time.perf_counter() - t0
        print(json.dumps({"layer": tag,
                          "evals_per_sec": round(args.n_evals * batch / dt, 1),
                          "us_per_step": round(1e6 * dt / args.n_evals, 2)}),
              flush=True)

    # --- 5. device->host transfer bandwidth over the relay ---
    # The pooled-metric warmup ships each chunk's positions to the host
    # ((chunk, C, dim) f32 ~ 51 MB at production shape) for f64
    # divergence-aware covariance pooling. If the relay moves this slowly,
    # a device-side masked X'X (2.5 MB) is worth building; if fast, the
    # host path stays.
    arr = jnp.ones((250, batch, dim), dtype)
    arr.block_until_ready()
    np.asarray(arr)  # warm the path
    t0 = time.perf_counter()
    np.asarray(arr)
    dt = time.perf_counter() - t0
    mb = arr.size * arr.dtype.itemsize / 1e6
    print(json.dumps({"layer": "d2h_transfer",
                      "mb": round(mb, 1), "s": round(dt, 3),
                      "mb_per_s": round(mb / dt, 1)}), flush=True)


if __name__ == "__main__":
    main()
