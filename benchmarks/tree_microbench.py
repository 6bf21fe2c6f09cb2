"""Microbench the layers of the batched NUTS transition at the
production shape (whitened FN n=397 -> dim 799, batch 64, dense metric).

The lockstep probe showed one lockstep leaf-iteration costs ~228 us
against a 47.8 us whitened-vg floor, and the hand-batched rewrite of the
checkpoint bookkeeping did not move it — so the overhead lives elsewhere
in the loop body. This bench times, per batched leaf:

  1. scan(leapfrog-only)       minimal carry, static trip count
  2. while(leapfrog-only)      same body, traced trip count
  3. scan(+metric matvec)      adds the (C,dim)@(dim,dim) HIGHEST product
  4. scan(+energy/bookkeeping) adds H, multinomial RNG, prop selects
  5. scan(+ckpt buffers)       adds the (C,K,dim) row writes + odd-leaf
                               U-turn sweep (= full subtree body)
  6. full transition           nuts_transition_batched chained in a scan
                               (per COMMITTED leaf; includes momentum
                               draws, outer merges, lockstep)

Usage (TPU): python -u benchmarks/tree_microbench.py [--batch 64] [--leaves 512]
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
    ap.add_argument("--leaves", type=int, default=512)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--fill", type=int, default=2)
    ap.add_argument("--eps", type=float, default=0.01)
    ap.add_argument("--n-trans", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    import bench
    from manifold_constrained_gaussian_process_inference_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    bench.wait_for_backend(
        max_wait_s=float(os.environ.get("MAGI_BACKEND_MAX_WAIT_S", 900)),
        poll_s=float(os.environ.get("MAGI_BACKEND_POLL_S", 60)),
    )
    from manifold_constrained_gaussian_process_inference_tpu.inference.nuts import (
        DenseMetric,
    )
    from manifold_constrained_gaussian_process_inference_tpu.inference import (
        nuts_batched as nb,
    )
    from manifold_constrained_gaussian_process_inference_tpu.inference.whiten import (
        build_psi_whitener,
        make_centered_whitened_vg,
    )

    target, psi0, host = bench.build_workload(fill=args.fill)
    dtype = target.data.mask.dtype
    C = args.batch
    whitener = build_psi_whitener(
        host["cov"], host["y"], target, np.asarray(psi0),
        np.asarray(bench.BETA), dtype,
    )
    vg_b = jax.vmap(make_centered_whitened_vg(target, whitener))
    dim = int(whitener.W.shape[0])
    print(f"devices={jax.devices()} dim={dim} batch={C}", flush=True)

    rng = np.random.default_rng(0)
    minv_np = np.eye(dim)
    chol_np = np.linalg.cholesky(minv_np)
    metric_trsm = DenseMetric(
        minv=jnp.asarray(minv_np, dtype),
        chol_minv=jnp.asarray(chol_np, dtype),
    )
    metric = DenseMetric(
        minv=jnp.asarray(minv_np, dtype),
        chol_minv=jnp.asarray(chol_np, dtype),
        p_chol=jnp.asarray(np.linalg.inv(chol_np).T, dtype),
    )
    q0 = jnp.asarray(0.01 * rng.normal(size=(C, dim)), dtype)
    p0 = jnp.asarray(rng.normal(size=(C, dim)), dtype)
    eps = jnp.full((C,), args.eps, dtype)
    keys = jax.random.split(jax.random.PRNGKey(0), C)
    logp0, grad0 = vg_b(q0)
    max_depth = 10

    def timeit(fn, *a, tag, leaves):
        out = fn(*a)
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
            out,
        )
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(*a)
            jax.tree_util.tree_map(
                lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
                out,
            )
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(json.dumps({
            "layer": tag, "us_per_leaf": round(1e6 * dt / leaves, 2),
            "evals_per_sec": round(leaves * C / dt, 1), "wall_s": round(dt, 3),
        }), flush=True)
        return out

    N = args.leaves

    # ---- 1/2: leapfrog-only, scan vs while ----
    def lf_body(carry):
        q, p, v, mgrad, grad = carry
        return nb._leapfrog_b(vg_b, q, p, v, mgrad, grad, eps, metric)

    def lf_scan(q, p, grad):
        v = nb._minv_mv_b(metric, p)
        mg = nb._minv_mv_b(metric, grad)

        def step(c, _):
            q, p, v, mgrad, grad = c
            q, p, v, mgrad, logp, grad = nb._leapfrog_b(
                vg_b, q, p, v, mgrad, grad, eps, metric
            )
            return (q, p, v, mgrad, grad), None

        c, _ = lax.scan(step, (q, p, v, mg, grad), None, length=N)
        return c[0]

    def lf_while(q, p, grad, n):
        v = nb._minv_mv_b(metric, p)
        mg = nb._minv_mv_b(metric, grad)

        def cond(s):
            return s[0] < n

        def body(s):
            j, q, p, v, mgrad, grad = s
            q, p, v, mgrad, logp, grad = nb._leapfrog_b(
                vg_b, q, p, v, mgrad, grad, eps, metric
            )
            return (j + 1, q, p, v, mgrad, grad)

        s = lax.while_loop(cond, body, (jnp.int32(0), q, p, v, mg, grad))
        return s[1]

    timeit(jax.jit(lf_scan), q0, p0, grad0, tag="leapfrog_scan", leaves=N)
    timeit(jax.jit(lf_while), q0, p0, grad0, jnp.int32(N),
           tag="leapfrog_while", leaves=N)

    # ---- 5: full subtree body (while, as production) ----
    def subtree(q, p, grad, keys, n):
        v = nb._minv_mv_b(metric, p)
        h0 = -logp0 + 0.5 * nb._rowdot(p, v)
        alive = jnp.ones((C,), bool)
        tree = nb._build_subtree_b(
            vg_b, q, p, v, grad, n, eps, metric, h0, keys, alive,
            max_depth, 1e9,  # huge divergence threshold: no early exit
        )
        return tree.q_right

    timeit(jax.jit(subtree), q0, p0, grad0, keys, jnp.int32(N),
           tag="subtree_while_full", leaves=N)

    # ---- 5b: momentum draw alone (the per-transition TRSM suspect) ----
    def draw_n(keys, n, m):
        def step(c, _):
            ks = jax.vmap(lambda k: jax.random.split(k))(c)
            p = nb._draw_momentum_b(ks[:, 1], q0, m)
            # fold p back into the keys so the solve cannot be hoisted
            return ks[:, 0], jnp.sum(p)

        c, s = lax.scan(step, keys, None, length=n)
        return s

    n_draws = 32
    # the printed us_per_leaf for these rows is us PER DRAW (batch of 64)
    timeit(jax.jit(lambda k: draw_n(k, n_draws, metric_trsm)), keys,
           tag="momentum_draw_trsm", leaves=n_draws)
    timeit(jax.jit(lambda k: draw_n(k, n_draws, metric)), keys,
           tag="momentum_draw_pchol_matmul", leaves=n_draws)

    # ---- 6: full transition chained ----
    def transitions(q, keys, n_trans):
        logp, grad = vg_b(q)

        def step(c, _):
            q, logp, grad, keys = c
            ks = jax.vmap(lambda k: jax.random.split(k))(keys)
            key, k_step = ks[:, 0], ks[:, 1]
            q, logp, grad, stats = nb.nuts_transition_batched(
                vg_b, q, logp, grad, k_step, eps, metric,
                max_depth=max_depth,
            )
            return (q, logp, grad, key), stats.num_leapfrog

        c, leaves = lax.scan(
            step, (q, logp, grad, keys), None, length=n_trans
        )
        return c[0], leaves

    n_trans = args.n_trans
    out = jax.jit(lambda q, k: transitions(q, k, n_trans))
    q_fin, leaves = out(q0, keys)
    leaves.block_until_ready()
    total = float(jnp.sum(leaves))
    t0 = time.perf_counter()
    q_fin, leaves = out(q0, keys)
    leaves.block_until_ready()
    dt = time.perf_counter() - t0
    total = float(jnp.sum(leaves))
    print(json.dumps({
        "layer": "full_transition_scan",
        "us_per_committed_leaf_batched": round(1e6 * dt / (total / C), 2),
        "committed_evals_per_sec": round(total / dt, 1),
        "mean_leaves_per_transition": round(total / (C * n_trans), 1),
        "wall_s": round(dt, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
