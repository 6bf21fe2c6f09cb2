"""Hand-batched NUTS (inference/nuts_batched.py) vs jax.vmap(nuts_transition).

The batched transition is a pure performance rewrite: same split
structure, same uniform draws, same select logic per chain. Given the
same per-chain PRNG keys it must reproduce the vmapped transition's
trajectories — discrete decisions (tree depth, leaf counts, divergences)
exactly, positions to floating-point agreement.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manifold_constrained_gaussian_process_inference_tpu.inference.nuts import (
    DenseMetric,
    nuts_transition,
)
from manifold_constrained_gaussian_process_inference_tpu.inference.nuts_batched import (
    init_warmup_carry_batched,
    make_sample_step_pooled_batched,
    make_warmup_step_pooled_batched,
    nuts_transition_batched,
)

DIM = 5
C = 8


def _vg_single():
    # anisotropic correlated Gaussian: exercises dense-metric paths
    rng = np.random.default_rng(0)
    a = rng.normal(size=(DIM, DIM))
    prec = jnp.asarray(a @ a.T + DIM * np.eye(DIM))

    def logp(q):
        return -0.5 * q @ prec @ q

    return jax.value_and_grad(logp)


def _metric(kind):
    if kind == "dense":
        rng = np.random.default_rng(1)
        b = rng.normal(size=(DIM, DIM)) * 0.1
        minv = np.eye(DIM) + b @ b.T
        return DenseMetric(
            minv=jnp.asarray(minv),
            chol_minv=jnp.asarray(np.linalg.cholesky(minv)),
        )
    if kind == "diag-shared":
        return jnp.asarray(np.linspace(0.5, 2.0, DIM))
    # per-chain diagonal
    rng = np.random.default_rng(2)
    return jnp.asarray(rng.uniform(0.5, 2.0, size=(C, DIM)))


@pytest.mark.parametrize("kind", ["dense", "diag-shared", "diag-per-chain"])
@pytest.mark.parametrize("eps", [0.05, 0.4])
def test_transition_matches_vmap(kind, eps):
    vg = _vg_single()
    vg_b = jax.vmap(vg)
    metric = _metric(kind)
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(C, DIM)))
    logp, grad = vg_b(q)
    keys = jax.random.split(jax.random.PRNGKey(7), C)
    eps_c = jnp.full((C,), eps)

    if kind == "diag-per-chain":
        ref = jax.jit(jax.vmap(
            lambda q1, l1, g1, k1, e1, m1: nuts_transition(
                vg, q1, l1, g1, k1, e1, m1, max_depth=6
            ),
        ))(q, logp, grad, keys, eps_c, metric)
    else:
        ref = jax.jit(jax.vmap(
            lambda q1, l1, g1, k1, e1: nuts_transition(
                vg, q1, l1, g1, k1, e1, metric, max_depth=6
            ),
        ))(q, logp, grad, keys, eps_c)
    got = jax.jit(
        lambda *a: nuts_transition_batched(
            vg_b, *a, inv_mass=metric, max_depth=6
        )
    )(q, logp, grad, keys, eps_c)

    q_r, lp_r, g_r, st_r = ref
    q_g, lp_g, g_g, st_g = got
    # discrete decisions must match exactly
    np.testing.assert_array_equal(
        np.asarray(st_r.tree_depth), np.asarray(st_g.tree_depth)
    )
    np.testing.assert_array_equal(
        np.asarray(st_r.num_leapfrog), np.asarray(st_g.num_leapfrog)
    )
    np.testing.assert_array_equal(
        np.asarray(st_r.diverging), np.asarray(st_g.diverging)
    )
    # continuous state to fp agreement (identical op sequence per chain,
    # different batching layout -> reduction-order ulps only)
    np.testing.assert_allclose(np.asarray(q_g), np.asarray(q_r),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(lp_g), np.asarray(lp_r),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(g_g), np.asarray(g_r),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(st_g.accept_prob), np.asarray(st_r.accept_prob),
        rtol=1e-9, atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(st_g.energy), np.asarray(st_r.energy),
        rtol=1e-9, atol=1e-9,
    )


def test_transition_chain_permutation_invariant():
    """Chains are independent: permuting the batch permutes the outputs."""
    vg = _vg_single()
    vg_b = jax.vmap(vg)
    metric = _metric("dense")
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(size=(C, DIM)))
    logp, grad = vg_b(q)
    keys = jax.random.split(jax.random.PRNGKey(11), C)
    eps = jnp.full((C,), 0.2)

    run = jax.jit(lambda qq, ll, gg, kk: nuts_transition_batched(
        vg_b, qq, ll, gg, kk, eps, metric, max_depth=6
    ))
    q1, lp1, _, st1 = run(q, logp, grad, keys)
    perm = np.asarray([3, 1, 4, 0, 7, 5, 2, 6])
    q2, lp2, _, st2 = run(q[perm], logp[perm], grad[perm], keys[perm])
    np.testing.assert_allclose(
        np.asarray(q2), np.asarray(q1)[perm], rtol=1e-9, atol=1e-9
    )
    np.testing.assert_array_equal(
        np.asarray(st2.num_leapfrog), np.asarray(st1.num_leapfrog)[perm]
    )


def test_gaussian_moments_batched():
    """E2E statistical correctness on a unit Gaussian: warmup (pooled
    step, fixed identity metric) + sampling through the batched scan
    factories reproduces mean 0 / var 1."""
    dim = 3
    vg_b = jax.vmap(jax.value_and_grad(lambda q: -0.5 * q @ q))
    n_chains = 16
    eye = jnp.eye(dim)
    metric = DenseMetric(minv=eye, chol_minv=eye)
    q0 = jnp.asarray(
        np.random.default_rng(0).normal(size=(n_chains, dim)) * 0.1
    )
    keys = jax.random.split(jax.random.PRNGKey(0), n_chains)

    carry = init_warmup_carry_batched(vg_b, q0, keys, 0.2)
    wstep = make_warmup_step_pooled_batched(vg_b, 0.8, max_depth=6)
    n_warm = 300
    iw = jnp.ones((n_warm,), bool)
    we = jnp.zeros((n_warm,), bool)

    @jax.jit
    def warm(c):
        return jax.lax.scan(
            lambda cc, x: wstep(cc, x, metric), c, (iw, we)
        )

    carry, _ = warm(carry)
    from manifold_constrained_gaussian_process_inference_tpu.inference.nuts import (
        SampleCarry,
    )

    eps = jnp.exp(carry.da.log_eps_avg)
    scarry = SampleCarry(chain=carry.chain, eps=eps, inv_mass=carry.inv_mass)
    sstep = make_sample_step_pooled_batched(vg_b, max_depth=6)

    @jax.jit
    def sample(c):
        return jax.lax.scan(
            lambda cc, x: sstep(cc, x, metric), c, None, length=500
        )

    _, (qs, lps, stats) = sample(scarry)
    draws = np.asarray(qs).reshape(-1, dim)
    assert np.all(np.abs(draws.mean(0)) < 0.1)
    assert np.all(np.abs(draws.std(0) - 1.0) < 0.12)
    assert float(np.asarray(stats.accept_prob).mean()) > 0.6
    assert not np.any(np.asarray(stats.diverging))
