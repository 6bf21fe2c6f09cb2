"""Within-posterior (time-grid) sharding tests on the virtual 8-device CPU
mesh: the sharded value-and-grad must reproduce the banded-path target
exactly (same band-truncation semantics, different summation layout).
No reference analogue (single-process Julia; SURVEY.md sec. 2.4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manifold_constrained_gaussian_process_inference_tpu.inference.target import (
    MagiTarget,
)
from manifold_constrained_gaussian_process_inference_tpu.models import FN_SYSTEM
from manifold_constrained_gaussian_process_inference_tpu.ops.gp_cov import (
    build_gp_cov,
)
from manifold_constrained_gaussian_process_inference_tpu.parallel.grid import (
    make_grid_mesh,
    make_grid_sharded_data,
    make_grid_value_and_grad,
)

N_DEV = len(jax.devices())


def _problem(n=64, bandsize=8, with_nan=True, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(0.0, 20.0, n)
    y = np.stack(
        [2.0 * np.sin(0.8 * t), 1.0 + 0.5 * np.cos(0.8 * t)], axis=-1
    ) + 0.2 * rng.normal(size=(n, 2))
    if with_nan:
        y[1::3, 0] = np.nan
        y[::4, 1] = np.nan
    phi = np.array([[2.0, 2.0], [1.5, 1.5]])
    cov = build_gp_cov(
        "matern52", phi, t, bandsize=bandsize, complexity=2, jitter=1e-6
    )
    return y, cov, t


def _psi(y, t, sigma_sampled=True, seed=1):
    rng = np.random.default_rng(seed)
    x0 = np.where(np.isfinite(y), y, 0.0) + 0.05 * rng.normal(size=y.shape)
    parts = [x0.T.reshape(-1), np.array([0.25, 0.2, 2.8])]
    if sigma_sampled:
        parts.append(np.log([0.2, 0.25]))
    return jnp.asarray(np.concatenate(parts))


def _reference_vg(y, cov, sigma_sampled, theta_transform=None):
    target = MagiTarget.build(
        y, cov, FN_SYSTEM, sigma_init=np.array([0.2, 0.2]),
        prior_temperature=np.array([1.0, 1.0, 2.0]),
        sigma_is_fixed=not sigma_sampled, band_impl="band",
        theta_transform=theta_transform,
    )
    return target.value_and_grad_fn()


def _sharded_vg(y, cov, n_dev, sigma_sampled, theta_transform=None):
    mesh = make_grid_mesh(n_dev)
    data = make_grid_sharded_data(
        y, cov, np.array([1.0, 1.0, 2.0]), n_dev
    )
    return make_grid_value_and_grad(
        data, FN_SYSTEM, np.array([0.2, 0.2]),
        sigma_is_fixed=not sigma_sampled, mesh=mesh,
        theta_transform=theta_transform,
    )


@pytest.mark.parametrize("sigma_sampled", [True, False])
def test_sharded_matches_banded_path(sigma_sampled):
    y, cov, t = _problem(n=64, bandsize=8)
    psi = _psi(y, t, sigma_sampled)
    v_ref, g_ref = _reference_vg(y, cov, sigma_sampled)(psi)
    v_sh, g_sh = jax.jit(_sharded_vg(y, cov, N_DEV, sigma_sampled))(psi)
    np.testing.assert_allclose(float(v_sh), float(v_ref), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(g_sh), np.asarray(g_ref), rtol=1e-8, atol=1e-10
    )


def test_sharded_matches_with_padding():
    """n not divisible by the mesh size exercises the ceil-division pad."""
    y, cov, t = _problem(n=61, bandsize=8)
    psi = _psi(y, t, True)
    v_ref, g_ref = _reference_vg(y, cov, True)(psi)
    v_sh, g_sh = jax.jit(_sharded_vg(y, cov, N_DEV, True))(psi)
    np.testing.assert_allclose(float(v_sh), float(v_ref), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(g_sh), np.asarray(g_ref), rtol=1e-8, atol=1e-10
    )


def test_sharded_wide_band_halo_spans_shards():
    """bandsize > nloc: operator halos wider than a shard still reproduce
    the banded path (x is replicated, so halos are pure slicing)."""
    y, cov, t = _problem(n=48, bandsize=10)  # nloc = 6 < b = 10
    psi = _psi(y, t, True)
    v_ref, g_ref = _reference_vg(y, cov, True)(psi)
    v_sh, g_sh = jax.jit(_sharded_vg(y, cov, N_DEV, True))(psi)
    np.testing.assert_allclose(float(v_sh), float(v_ref), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(g_sh), np.asarray(g_ref), rtol=1e-8, atol=1e-10
    )


def test_sharded_with_theta_transform():
    from manifold_constrained_gaussian_process_inference_tpu.inference.transforms import (
        make_theta_transform,
    )

    tr = make_theta_transform(
        FN_SYSTEM.theta_lower_bound, FN_SYSTEM.theta_upper_bound
    )
    y, cov, t = _problem(n=64, bandsize=8)
    psi = _psi(y, t, True)
    v_ref, g_ref = _reference_vg(y, cov, True, tr)(psi)
    v_sh, g_sh = jax.jit(_sharded_vg(y, cov, N_DEV, True, tr))(psi)
    np.testing.assert_allclose(float(v_sh), float(v_ref), rtol=1e-10)
    np.testing.assert_allclose(
        np.asarray(g_sh), np.asarray(g_ref), rtol=1e-8, atol=1e-10
    )


def test_nuts_runs_on_grid_sharded_vg():
    """The sharded closure composes with the unchanged NUTS machinery
    (shard_map inside jit+scan): a short run executes and stays finite."""
    from manifold_constrained_gaussian_process_inference_tpu.inference.nuts import (
        run_nuts,
    )

    y, cov, t = _problem(n=64, bandsize=8)
    psi = _psi(y, t, True)
    vg = _sharded_vg(y, cov, N_DEV, True)
    samples, stats = run_nuts(
        vg, psi, jax.random.PRNGKey(0), n_samples=8, n_adapts=4,
        initial_step_size=1e-3, max_depth=4,
    )
    assert samples.shape == (4, psi.shape[0])
    assert np.all(np.isfinite(np.asarray(samples)))
