"""Whitened solve in float32 (the TPU configuration): the Gauss-Newton MAP
must run on the float64 CPU replica (f32 line search stalls at |lp| ~ 1e5)
and the sampled posterior must stay in the data mode."""
import jax.numpy as jnp
import numpy as np

from manifold_constrained_gaussian_process_inference_tpu.config import MagiConfig
from manifold_constrained_gaussian_process_inference_tpu.inference.solve import (
    solve_magi,
)
from manifold_constrained_gaussian_process_inference_tpu.models import FN_SYSTEM
import pytest

pytestmark = pytest.mark.slow  # heavy sampler E2E; fast suite = -m "not slow"


def test_whitened_solve_float32():
    rng = np.random.default_rng(5)
    n = 21
    t = np.linspace(0, 6, n)
    y = np.stack([np.sin(t), np.cos(t)], -1) + 0.2 * rng.normal(size=(n, 2))
    cfg = MagiConfig(
        niter_hmc=300, seed=2, x_whitened=True, dtype=jnp.float32,
        gp_optim_iterations=40, step_size_factor=0.1,
    )
    res = solve_magi(y, t, FN_SYSTEM, cfg)
    assert res.theta.dtype == np.float64  # results surface as host float64
    assert np.all(np.isfinite(res.theta))
    # stays in the data mode: sigma near the noise scale, not inflated
    assert np.all(res.sigma.mean(axis=0) < 0.8)
    # trajectories track the data
    err = np.abs(res.x_sampled.mean(0) - y)
    assert np.nanmedian(err) < 0.5
