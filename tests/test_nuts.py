"""NUTS sampler tests: analytic-target validation (std normal, correlated
Gaussian), adaptation sanity, divergence handling, vmapped-chain equivalence.
The reference only smoke-tests its sampler (test/test_samplers.jl:102-144);
the analytic checks here are stronger, and the vmap-equivalence test has no
reference analogue (SURVEY.md section 4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manifold_constrained_gaussian_process_inference_tpu.inference.adapt import (
    build_window_schedule,
)
from manifold_constrained_gaussian_process_inference_tpu.inference.nuts import (
    nuts_transition,
    run_nuts,
)


def test_window_schedule_stan_layout():
    in_win, win_end = build_window_schedule(1000)
    # Stan: 75 init buffer, windows 25/50/100/..., 50 term buffer
    assert not in_win[:75].any()
    assert not in_win[950:].any()
    assert in_win[75:950].all()
    ends = np.flatnonzero(win_end)
    assert ends[0] == 99  # 75 + 25 - 1
    assert ends[-1] == 949
    # short warmup degenerates but stays consistent
    iw, we = build_window_schedule(40)
    assert we.sum() == 1 and iw.sum() > 0
    iw0, we0 = build_window_schedule(0)
    assert len(iw0) == 0


def test_std_normal_moments():
    d = 4
    vg = jax.value_and_grad(lambda q: -0.5 * jnp.sum(q * q))
    samples, info = jax.jit(
        lambda q0, k: run_nuts(vg, q0, k, n_samples=4000, n_adapts=1000)
    )(jnp.zeros(d), jax.random.PRNGKey(0))
    s = np.asarray(samples)
    assert np.abs(s.mean(0)).max() < 0.15
    assert np.abs(s.var(0) - 1.0).max() < 0.2
    assert 0.6 < float(np.mean(info["accept_prob"])) <= 1.0
    assert int(np.sum(info["diverging"])) == 0


def test_correlated_gaussian_moments_and_mass_adaptation():
    d = 5
    rng = np.random.default_rng(1)
    a = rng.normal(size=(d, d))
    covm = a @ a.T + d * np.eye(d)
    prec = jnp.asarray(np.linalg.inv(covm))
    mu = jnp.asarray(np.arange(d, dtype=float))
    vg = jax.value_and_grad(lambda q: -0.5 * (q - mu) @ prec @ (q - mu))
    samples, info = jax.jit(
        lambda q0, k: run_nuts(vg, q0, k, n_samples=5000, n_adapts=1500)
    )(jnp.zeros(d), jax.random.PRNGKey(3))
    s = np.asarray(samples)
    sd = np.sqrt(np.diag(covm))
    assert np.all(np.abs(s.mean(0) - np.arange(d)) < 0.25 * sd)
    assert np.all(np.abs(s.var(0) / np.diag(covm) - 1.0) < 0.35)
    # adapted inverse metric approximates the marginal variances
    ratio = np.asarray(info["inv_mass"]) / np.diag(covm)
    assert np.all(ratio > 0.3) and np.all(ratio < 3.0)


def test_divergence_rejects_instead_of_throwing():
    """-Inf / NaN densities must produce divergences, not exceptions —
    deliberate improvement over the reference's asserts (samplers.jl:58-60)."""

    def logp(q):
        # log density of a target with a hard wall: -inf for q[0] > 1
        base = -0.5 * jnp.sum(q * q)
        return jnp.where(q[0] > 1.0, -jnp.inf, base)

    vg = jax.value_and_grad(logp)
    q0 = jnp.zeros(3)
    logp0, grad0 = vg(q0)
    q, lp, g, stats = jax.jit(
        lambda key: nuts_transition(
            vg, q0, logp0, grad0, key, jnp.asarray(2.5), jnp.ones(3)
        )
    )(jax.random.PRNGKey(0))
    assert np.all(np.isfinite(np.asarray(q)))
    assert np.isfinite(float(lp))


def test_vmapped_chains_match_single_chain_bitwise():
    """Chain c of a vmapped run equals an identically-keyed single run."""
    d = 3
    vg = jax.value_and_grad(lambda q: -0.5 * jnp.sum(q * q))
    keys = jax.random.split(jax.random.PRNGKey(7), 4)
    q0s = jnp.stack([jnp.full((d,), i * 0.1) for i in range(4)])

    def single(q0, key):
        return run_nuts(vg, q0, key, n_samples=150, n_adapts=80)

    s_multi, info_multi = jax.jit(jax.vmap(single))(q0s, keys)
    s_one, _ = jax.jit(single)(q0s[2], keys[2])
    assert np.allclose(np.asarray(s_multi[2]), np.asarray(s_one), atol=0.0)


def test_reproducible_given_key():
    d = 2
    vg = jax.value_and_grad(lambda q: -0.5 * jnp.sum(q * q))
    f = jax.jit(lambda: run_nuts(vg, jnp.zeros(d), jax.random.PRNGKey(5), 100, 50))
    s1, _ = f()
    s2, _ = f()
    assert np.array_equal(np.asarray(s1), np.asarray(s2))


def test_branchless_ckpt_index_helpers_match_reference():
    """The SWAR popcount / branchless checkpoint-range helpers must agree
    with the textbook loop formulation (Phan & Pradhan iterative NUTS:
    idx_max = popcount(n >> 1), trailing-ones via shift loop) for every
    leaf index that can occur at max_depth <= 11."""
    from manifold_constrained_gaussian_process_inference_tpu.inference.nuts import (
        _leaf_idx_to_ckpt_idxs,
        _popcount32,
    )

    ns = np.arange(0, 2048, dtype=np.int32)
    lo, hi = jax.jit(jax.vmap(_leaf_idx_to_ckpt_idxs))(jnp.asarray(ns))
    pc = jax.jit(jax.vmap(_popcount32))(jnp.asarray(ns))
    for n in ns:
        assert int(pc[n]) == bin(int(n)).count("1")
        ref_max = bin(int(n) >> 1).count("1")
        m, trail = int(n), 0
        while m & 1:
            m >>= 1
            trail += 1
        assert int(hi[n]) == ref_max
        assert int(lo[n]) == ref_max - trail + 1


def test_vectorized_iterative_turning_matches_serial_loop():
    """The masked-row vectorized U-turn sweep must reproduce the serial
    checkpoint walk (any sub-subtree turning in [idx_min, idx_max])."""
    from manifold_constrained_gaussian_process_inference_tpu.inference.nuts import (
        _is_iterative_turning,
    )

    rng = np.random.default_rng(0)
    k, dim = 8, 5
    hits = 0
    for trial in range(200):
        r = rng.normal(size=(k, dim)).astype(np.float32)
        v = rng.normal(size=(k, dim)).astype(np.float32)
        rho_c = np.cumsum(rng.normal(size=(k, dim)), axis=0).astype(np.float32)
        p_leaf = rng.normal(size=dim).astype(np.float32)
        v_leaf = rng.normal(size=dim).astype(np.float32)
        rho_cum = rng.normal(size=dim).astype(np.float32)
        lo = int(rng.integers(0, k))
        hi = int(rng.integers(lo, k))

        ref = False
        for i in range(lo, hi + 1):
            rho_sub = rho_cum - rho_c[i] + r[i]
            rc = rho_sub - 0.5 * (r[i] + p_leaf)
            ref = ref or (float(v[i] @ rc) <= 0.0) or (float(v_leaf @ rc) <= 0.0)
        got = bool(
            jax.jit(_is_iterative_turning)(
                jnp.asarray(p_leaf), jnp.asarray(v_leaf), jnp.asarray(rho_cum),
                jnp.asarray(r), jnp.asarray(v), jnp.asarray(rho_c),
                jnp.asarray(lo, dtype=jnp.int32), jnp.asarray(hi, dtype=jnp.int32),
            )
        )
        assert got == ref, (trial, lo, hi)
        hits += got
    assert 0 < hits < 200  # both branches exercised
