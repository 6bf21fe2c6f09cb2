"""Parallel tempering tests: mode-hopping on a bimodal target that plain
NUTS cannot cross, swap bookkeeping, and exactness on a Gaussian."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manifold_constrained_gaussian_process_inference_tpu.inference.nuts import (
    run_nuts,
)
from manifold_constrained_gaussian_process_inference_tpu.inference.tempering import (
    geometric_ladder,
    run_parallel_tempering,
)


def test_geometric_ladder():
    t = geometric_ladder(5, 16.0)
    assert t[0] == 1.0 and np.isclose(t[-1], 16.0)
    assert np.all(np.diff(np.log(t)) > 0)
    assert np.allclose(np.diff(np.log(t)), np.diff(np.log(t))[0])


def _bimodal_vg(sep=6.0):
    # mixture of two unit Gaussians at +-sep/2 in the first coordinate
    mu = sep / 2.0

    def logp(q):
        a = -0.5 * jnp.sum((q - jnp.array([mu, 0.0])) ** 2)
        b = -0.5 * jnp.sum((q + jnp.array([mu, 0.0])) ** 2)
        return jnp.logaddexp(a, b) - jnp.log(2.0)

    return jax.value_and_grad(logp)


def test_pt_crosses_modes_where_nuts_cannot():
    vg = _bimodal_vg(sep=10.0)
    q0 = jnp.array([5.0, 0.0])  # start in the right mode

    # plain NUTS stays in one mode
    s_nuts, _ = jax.jit(
        lambda: run_nuts(vg, q0, jax.random.PRNGKey(0), 1500, 500)
    )()
    frac_left_nuts = float(np.mean(np.asarray(s_nuts)[:, 0] < 0))
    assert frac_left_nuts < 0.05

    # PT visits both modes with roughly equal mass
    s_pt, info = run_parallel_tempering(
        vg, q0, jax.random.PRNGKey(0), n_samples=2500, n_adapts=1000,
        n_temps=6, max_temp=64.0, chunk_size=1500,
    )
    frac_left = float(np.mean(s_pt[:, 0] < 0))
    assert 0.15 < frac_left < 0.85
    assert info["swap_acceptance"] > 0.1
    # both modes centered correctly
    left = s_pt[s_pt[:, 0] < 0]
    right = s_pt[s_pt[:, 0] > 0]
    assert abs(left[:, 0].mean() + 5.0) < 0.5
    assert abs(right[:, 0].mean() - 5.0) < 0.5


def test_pt_exact_on_gaussian():
    """With any ladder, the T=1 chain must sample the exact target."""
    vg = jax.value_and_grad(lambda q: -0.5 * jnp.sum(q * q))
    s, info = run_parallel_tempering(
        vg, jnp.zeros(3), jax.random.PRNGKey(1), n_samples=3000,
        n_adapts=1000, n_temps=4, max_temp=8.0,
    )
    assert abs(s.mean()) < 0.1
    assert np.all(np.abs(s.var(0) - 1.0) < 0.25)
    assert s.shape == (2000, 3)


def test_pt_single_temperature_degenerates_to_nuts_like():
    vg = jax.value_and_grad(lambda q: -0.5 * jnp.sum(q * q))
    s, info = run_parallel_tempering(
        vg, jnp.zeros(2), jax.random.PRNGKey(2), n_samples=600,
        n_adapts=300, temperatures=[1.0],
    )
    assert np.all(np.isfinite(s))
    assert info["swap_acceptance"] == 0.0 or info["swap_acceptance"] >= 0.0
    assert abs(s.var(0).mean() - 1.0) < 0.4
