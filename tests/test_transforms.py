"""Bounded theta reparameterization tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manifold_constrained_gaussian_process_inference_tpu.inference.transforms import (
    constrain,
    constrain_np,
    make_theta_transform,
    unconstrain,
)


@pytest.fixture
def tr():
    return make_theta_transform(
        lb=[0.0, -np.inf, -np.inf, 1.0],
        ub=[np.inf, 2.0, np.inf, 3.0],
    )


def test_kinds(tr):
    assert list(tr.kind) == [1, 2, 0, 3]


def test_roundtrip(tr):
    theta = np.array([0.37, -1.2, 5.0, 2.9])
    z = unconstrain(tr, theta)
    back, _ = constrain(tr, jnp.asarray(z))
    assert np.allclose(np.asarray(back), theta, rtol=1e-10)
    assert np.allclose(constrain_np(tr, z), theta, rtol=1e-10)


def test_bounds_respected(tr):
    z = jnp.asarray(np.linspace(-30, 30, 7))
    for zi in z:
        th, _ = constrain(tr, jnp.full(4, zi))
        th = np.asarray(th)
        assert th[0] >= 0.0
        assert th[1] <= 2.0
        assert 1.0 <= th[3] <= 3.0


def test_jacobian_matches_autodiff(tr):
    """log|dT/dz| must equal the sum of log-derivatives of each component."""
    z = jnp.asarray([0.3, -0.7, 1.1, 0.4])
    _, logjac = constrain(tr, z)

    def comp(i):
        return lambda zi: constrain(tr, z.at[i].set(zi))[0][i]

    manual = sum(
        float(jnp.log(jnp.abs(jax.grad(comp(i))(z[i])))) for i in range(4)
    )
    assert np.isclose(float(logjac), manual, rtol=1e-8)


def test_solver_constrained_theta_stays_positive():
    """End-to-end: with theta_constrained=True every FN theta draw is > 0
    (unconstrained runs can and do cross; SURVEY.md quirk note)."""
    import manifold_constrained_gaussian_process_inference_tpu as m
    from manifold_constrained_gaussian_process_inference_tpu.config import MagiConfig
    from manifold_constrained_gaussian_process_inference_tpu.models import FN_SYSTEM

    rng = np.random.default_rng(0)
    n = 11
    t = np.linspace(0, 4, n)
    y = np.stack([np.sin(t), np.cos(t)], -1) + 0.2 * rng.normal(size=(n, 2))
    cfg = MagiConfig(
        niter_hmc=60, seed=1, theta_constrained=True,
        sigma=[0.2, 0.2], phi=np.array([[1.0, 1.0], [1.5, 1.5]]),
        map_init_iterations=50,
    )
    res = m.solve_magi(y, t, FN_SYSTEM, cfg)
    assert np.all(res.theta > 0.0)
    assert np.all(np.isfinite(res.theta))
