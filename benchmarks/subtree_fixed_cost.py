"""Isolate the fixed per-call cost of the batched subtree / outer loop.

tree_microbench showed: subtree body 92 us/leaf in a long run, but full
transitions cost ~1.5-3 ms PER DOUBLING beyond leaves x 92 us. Relay
dispatch is ~8 ms per jit invocation, so every measurement here runs K
repetitions INSIDE one program (lax.scan) and reports per-repetition
cost:

  subtree_n{n}:      one _build_subtree_b call of n leaves, x K
  transition_md{m}:  one full transition at max_depth=m with eps tiny
                     (every subtree saturates, no early U-turn), x K

fixed-cost-per-subtree = slope of transition_md over m minus the leaf
term; intercept of subtree_n over n is the per-call overhead.

Usage (TPU): python -u benchmarks/subtree_fixed_cost.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    import bench
    from manifold_constrained_gaussian_process_inference_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    bench.wait_for_backend()
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

    target, psi0, host = bench.build_workload(fill=2)
    dtype = target.data.mask.dtype
    C = 64
    whitener = build_psi_whitener(
        host["cov"], host["y"], target, np.asarray(psi0),
        np.asarray(bench.BETA), dtype,
    )
    vg_b = jax.vmap(make_centered_whitened_vg(target, whitener))
    dim = int(whitener.W.shape[0])
    rng = np.random.default_rng(0)
    eye = jnp.eye(dim, dtype=dtype)
    metric = DenseMetric(minv=eye, chol_minv=eye, p_chol=eye)
    q0 = jnp.asarray(0.01 * rng.normal(size=(C, dim)), dtype)
    p0 = jnp.asarray(rng.normal(size=(C, dim)), dtype)
    eps = jnp.full((C,), 1e-4, dtype)
    keys = jax.random.split(jax.random.PRNGKey(0), C)
    logp0, grad0 = vg_b(q0)

    def timed(fn, *a, tag, reps, per):
        out = fn(*a)
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready()
            if hasattr(x, "block_until_ready") else x, out,
        )
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*a)
            jax.tree_util.tree_map(
                lambda x: x.block_until_ready()
                if hasattr(x, "block_until_ready") else x, out,
            )
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(json.dumps({
            "layer": tag, f"ms_per_{per}": round(1e3 * dt / reps, 3),
            "wall_s": round(dt, 3),
        }), flush=True)
        return out

    K = 32

    def subtree_k(q, p, grad, keys, n):
        v0 = nb._minv_mv_b(metric, p)
        h0 = -logp0 + 0.5 * nb._rowdot(p, v0)
        alive = jnp.ones((C,), bool)

        def step(c, _):
            q, keys = c
            ks = jax.vmap(lambda k: jax.random.split(k))(keys)
            tree = nb._build_subtree_b(
                vg_b, q, p, v0, grad, n, eps, metric, h0, ks[:, 1],
                alive, 10, 1e9,
            )
            return (tree.q_right, ks[:, 0]), None

        c, _ = lax.scan(step, (q, keys), None, length=K)
        return c[0]

    f = jax.jit(subtree_k, static_argnames=())
    for n in (1, 4, 16, 64):
        timed(f, q0, p0, grad0, keys, jnp.int32(n),
              tag=f"subtree_n{n}_xK", reps=K, per="subtree_call")

    for md in (1, 3, 6, 9):
        def trans_k(q, keys, md=md):
            logp, grad = vg_b(q)

            def step(c, _):
                q, logp, grad, keys = c
                ks = jax.vmap(lambda k: jax.random.split(k))(keys)
                q2, l2, g2, stats = nb.nuts_transition_batched(
                    vg_b, q, logp, grad, ks[:, 1], eps, metric,
                    max_depth=md,
                )
                return (q2, l2, g2, ks[:, 0]), stats.num_leapfrog

            c, leaves = lax.scan(
                step, (q, logp, grad, keys), None, length=K
            )
            return c[0], leaves

        out = timed(jax.jit(trans_k), q0, keys,
                    tag=f"transition_md{md}_xK", reps=K, per="transition")
        leaves = float(jnp.mean(jnp.sum(out[1], axis=0))) if hasattr(
            out[1], "shape") else 0.0
        print(json.dumps({"layer": f"transition_md{md}_leaves",
                          "mean_leaves_per_transition":
                          round(leaves / K, 1)}), flush=True)


if __name__ == "__main__":
    main()
