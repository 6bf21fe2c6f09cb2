"""End-to-end smoke coverage for the remaining model families (HIV,
protein transduction, log-Hes1 variants) through solve_magi — the reference
only exercises FN end-to-end; its other models exist solely as ODE
definitions (SURVEY.md section 4)."""
import numpy as np
import pytest

from manifold_constrained_gaussian_process_inference_tpu.config import MagiConfig
from manifold_constrained_gaussian_process_inference_tpu.inference.solve import (
    solve_magi,
)
from manifold_constrained_gaussian_process_inference_tpu.models import (
    HES1LOG_FIXG_SYSTEM,
    HIV_SYSTEM,
    PTRANS_SYSTEM,
)
from manifold_constrained_gaussian_process_inference_tpu.utils.integrators import (
    integrate_system,
    sample_on_grid,
)


def _make_data(system, x0, theta, t_end, n_obs, noise, seed=0, n_steps=3000):
    rng = np.random.default_rng(seed)
    ts, xs = integrate_system(system, x0, 0.0, t_end, np.asarray(theta), n_steps)
    t_obs = np.linspace(0.0, t_end, n_obs)
    y = sample_on_grid(ts, xs, t_obs) + rng.normal(size=(n_obs, len(x0))) * noise
    return t_obs, y


def test_ptrans_e2e_smoke():
    theta = [0.07, 0.6, 0.05, 0.3, 0.017, 0.3]
    t, y = _make_data(
        PTRANS_SYSTEM, [1.0, 0.0, 1.0, 0.0, 0.0], theta, 60.0, 15, 0.01
    )
    d = y.shape[1]
    cfg = MagiConfig(
        niter_hmc=60, seed=2, theta_constrained=True, map_init_iterations=100,
        sigma=np.full(d, 0.01),
        phi=np.vstack([np.full(d, 0.5), np.full(d, 20.0)]),
    )
    res = solve_magi(y, t, PTRANS_SYSTEM, cfg)
    assert res.theta.shape == (30, 6)
    assert np.all(np.isfinite(res.theta))
    assert np.all(res.theta > 0)
    assert np.all(np.isfinite(res.x_sampled))


def test_hiv_e2e_smoke():
    # log-scale HIV states; params from the MAGI benchmark setup
    theta = [36.0, 0.108, 0.5, 1e3, 1e3, 1e3, -0.2, -0.3, -0.5]
    x0 = np.log([600.0, 30.0, 20.0, 8.0])
    t, y = _make_data(HIV_SYSTEM, x0, theta, 0.1, 12, 0.05, n_steps=2000)
    d = y.shape[1]
    cfg = MagiConfig(
        niter_hmc=40, seed=3, map_init_iterations=50,
        sigma=np.full(d, 0.05),
        phi=np.vstack([np.full(d, 10.0), np.full(d, 0.1)]),
    )
    res = solve_magi(y, t, HIV_SYSTEM, cfg)
    assert res.theta.shape == (20, 9)
    assert np.all(np.isfinite(res.theta))
    assert np.all(np.isfinite(res.lp))


def test_hes1log_fixg_e2e_smoke():
    theta = [0.022, 0.3, 0.031, 0.028, 0.5, 20.0]
    x0 = np.log([1.439, 2.037, 17.904])
    t, y = _make_data(HES1LOG_FIXG_SYSTEM, x0, theta, 120.0, 13, 0.1)
    d = 3
    cfg = MagiConfig(
        niter_hmc=40, seed=4, theta_constrained=True, map_init_iterations=100,
        gp_mean="observed",
        sigma=np.full(d, 0.1),
        phi=np.vstack([np.full(d, 1.0), np.full(d, 40.0)]),
    )
    res = solve_magi(y, t, HES1LOG_FIXG_SYSTEM, cfg)
    assert res.theta.shape == (20, 6)
    assert np.all(res.theta > 0)
    assert np.all(np.isfinite(res.x_sampled))
