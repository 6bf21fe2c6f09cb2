"""Multi-device chain parallelism tests on the virtual 8-device CPU mesh.
No reference analogue (the reference is single-process; SURVEY.md sec. 2.4) —
this is the TPU-native capability the framework adds."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manifold_constrained_gaussian_process_inference_tpu.parallel.chains import (
    make_chain_mesh,
    run_chains,
)

pytestmark = pytest.mark.slow  # heavy sampler E2E; fast suite = -m "not slow"


@pytest.fixture(scope="module")
def vg():
    return jax.value_and_grad(lambda q: -0.5 * jnp.sum(q * q))


N_DEV = len(jax.devices())


def test_virtual_devices_present():
    assert N_DEV >= 2  # conftest forces 8 unless the env overrides


def test_sharded_chains_deterministic_and_statistically_equivalent(vg):
    """The sharded run must be (a) bitwise deterministic across executions
    and (b) statistically indistinguishable from the single-device vmap run.
    (Bitwise vmap-vs-shard_map equality does NOT hold: the two XLA programs
    fuse differently, and NUTS trajectories are chaotic in the last ulp.)"""
    dim, n_chains = 3, N_DEV
    psi0 = jnp.zeros((n_chains, dim))
    keys = jax.random.split(jax.random.PRNGKey(0), n_chains)
    s_vmap, _ = run_chains(vg, psi0, keys, n_samples=600, n_adapts=300, mesh=None)
    mesh = make_chain_mesh(N_DEV)
    s_shard, _ = run_chains(vg, psi0, keys, n_samples=600, n_adapts=300, mesh=mesh)
    s_shard2, _ = run_chains(vg, psi0, keys, n_samples=600, n_adapts=300, mesh=mesh)
    assert np.array_equal(np.asarray(s_shard), np.asarray(s_shard2))
    a = np.asarray(s_vmap).reshape(-1, dim)
    b = np.asarray(s_shard).reshape(-1, dim)
    assert np.all(np.abs(a.mean(0) - b.mean(0)) < 0.15)
    assert np.all(np.abs(a.std(0) - b.std(0)) < 0.2)


def test_sharded_multiple_chains_per_device(vg):
    half = max(N_DEV // 2, 1)
    mesh = make_chain_mesh(half)
    psi0 = jnp.zeros((2 * half, 2))
    keys = jax.random.split(jax.random.PRNGKey(1), 2 * half)
    s, info = run_chains(vg, psi0, keys, n_samples=20, n_adapts=10, mesh=mesh)
    assert s.shape == (2 * half, 10, 2)
    assert np.all(np.isfinite(np.asarray(s)))


def test_chain_count_mesh_mismatch_raises(vg):
    if N_DEV < 2:
        pytest.skip("needs >= 2 devices")
    mesh = make_chain_mesh(N_DEV)
    psi0 = jnp.zeros((N_DEV + 1, 2))
    keys = jax.random.split(jax.random.PRNGKey(1), N_DEV + 1)
    with pytest.raises(ValueError):
        run_chains(vg, psi0, keys, n_samples=4, n_adapts=2, mesh=mesh)


def test_solve_magi_with_mesh():
    """solve_magi end-to-end with chains sharded over the device mesh."""
    import manifold_constrained_gaussian_process_inference_tpu as m
    from manifold_constrained_gaussian_process_inference_tpu.config import MagiConfig
    from manifold_constrained_gaussian_process_inference_tpu.inference.solve import (
        solve_magi,
    )
    from manifold_constrained_gaussian_process_inference_tpu.models import FN_SYSTEM

    if N_DEV < 2:
        pytest.skip("needs >= 2 devices")
    rng = np.random.default_rng(0)
    t = np.linspace(0, 4, 9)
    y = np.stack([np.sin(t), np.cos(t)], -1) + 0.2 * rng.normal(size=(9, 2))
    cfg = MagiConfig(
        niter_hmc=40, n_chains=N_DEV, seed=3,
        sigma=[0.2, 0.2], phi=np.array([[1.0, 1.0], [1.5, 1.5]]),
    )
    res = solve_magi(y, t, FN_SYSTEM, cfg, mesh=make_chain_mesh(N_DEV))
    assert res.theta.shape == (N_DEV * 20, 3)
    assert np.all(np.isfinite(res.theta))


def test_graft_entry_dryrun():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    v, g = out
    assert np.isfinite(float(v))
    assert np.all(np.isfinite(np.asarray(g)))
    ge.dryrun_multichip(N_DEV)


def test_sharded_pooled_dense_matches_vmap(vg):
    """mesh + mass_matrix='dense-pooled' must (a) run (exercises the
    device-side moment accumulation's shard_map specs + psum), (b) be
    bitwise deterministic across executions, and (c) agree statistically
    with the single-device pooled run (bitwise equality cannot hold: the
    psum'd window moments differ from the single-device einsum in
    reduction order, and NUTS trajectories are chaotic in the last ulp)."""
    dim, n_chains = 3, 2 * N_DEV
    psi0 = jnp.zeros((n_chains, dim))
    keys = jax.random.split(jax.random.PRNGKey(4), n_chains)
    kwargs = dict(n_samples=600, n_adapts=300, mass_matrix="dense-pooled")
    s_vmap, info_v = run_chains(vg, psi0, keys, mesh=None, **kwargs)
    mesh = make_chain_mesh(N_DEV)
    s_shard, info_s = run_chains(vg, psi0, keys, mesh=mesh, **kwargs)
    s_shard2, _ = run_chains(vg, psi0, keys, mesh=mesh, **kwargs)
    assert info_s["metric"] == "dense-pooled"
    assert info_s["inv_mass"].shape == (dim, dim)
    assert np.array_equal(np.asarray(s_shard), np.asarray(s_shard2))
    # the pooled metrics agree to reduction-order rounding amplified by
    # one window of feedback; both must be symmetric PSD
    for m in (info_v["inv_mass"], info_s["inv_mass"]):
        np.testing.assert_allclose(m, m.T, atol=1e-12)
        assert np.all(np.linalg.eigvalsh(m) > 0)
    a = np.asarray(s_vmap).reshape(-1, dim)
    b = np.asarray(s_shard).reshape(-1, dim)
    assert np.all(np.abs(a.mean(0) - b.mean(0)) < 0.15)
    assert np.all(np.abs(a.std(0) - b.std(0)) < 0.2)
