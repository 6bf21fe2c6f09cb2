"""End-to-end solve_magi tests — mirrors test/test_solver.jl (fixed phi/sigma
smoke with a NaN obs) and test/runtests.jl (sigma-sampling E2E with accuracy
assertions, shrunk to CI scale)."""
import numpy as np
import pytest

import manifold_constrained_gaussian_process_inference_tpu as m
from manifold_constrained_gaussian_process_inference_tpu.config import MagiConfig
from manifold_constrained_gaussian_process_inference_tpu.inference.solve import (
    MagiError,
    solve_magi,
)
from manifold_constrained_gaussian_process_inference_tpu.models import FN_SYSTEM
from manifold_constrained_gaussian_process_inference_tpu.utils.integrators import (
    integrate_system,
    sample_on_grid,
)


def _fn_data(n_obs=41, t_end=10.0, sigma=0.2, seed=123, fill=1):
    """FN synthetic data like test/runtests.jl:13-44: RK truth + seeded noise,
    on a grid densified by 2^fill - 1 inserted points (NaN at non-obs)."""
    rng = np.random.default_rng(seed)
    theta_true = np.array([0.2, 0.2, 3.0])
    ts, xs = integrate_system(FN_SYSTEM, [-1.0, 1.0], 0.0, t_end, theta_true, 4000)
    t_obs = np.linspace(0.0, t_end, n_obs)
    x_at_obs = sample_on_grid(ts, xs, t_obs)
    y_at_obs = x_at_obs + rng.normal(size=x_at_obs.shape) * sigma

    if fill > 0:
        pts = []
        ins = 2**fill - 1
        for i in range(n_obs - 1):
            seg = np.linspace(t_obs[i], t_obs[i + 1], ins + 2)[:-1]
            pts.append(seg)
        pts.append(t_obs[-1:])
        t_grid = np.concatenate(pts)
        y_grid = np.full((len(t_grid), 2), np.nan)
        obs_idx = np.arange(0, len(t_grid), ins + 1)
        y_grid[obs_idx] = y_at_obs
    else:
        t_grid, y_grid = t_obs, y_at_obs
    return t_grid, y_grid, theta_true, x_at_obs


def test_fixed_phi_sigma_smoke():
    """Shapes/types/finiteness with exogenous phi+sigma, tiny run, one NaN
    (test_solver.jl:84-129)."""
    t_grid, y_grid, theta_true, _ = _fn_data(n_obs=9, t_end=4.0, fill=0)
    y_grid = y_grid.copy()
    y_grid[3, 0] = np.nan
    n, d = y_grid.shape
    cfg = MagiConfig(
        niter_hmc=40,
        burnin_ratio=0.5,
        sigma=[0.2, 0.2],
        phi=np.array([[1.0, 1.0], [1.5, 1.5]]),
        band_size=20,
        seed=1,
    )
    res = solve_magi(y_grid, t_grid, FN_SYSTEM, cfg)
    n_keep = 20
    assert res.theta.shape == (n_keep, 3)
    assert res.x_sampled.shape == (n_keep, n, d)
    assert res.sigma.shape == (n_keep, d)
    # fixed sigma: every row equals the input (test_solver.jl:96 semantics,
    # current-code behavior MagiJl.jl:696)
    assert np.allclose(res.sigma, 0.2)
    assert res.phi.shape == (2, d)
    assert res.lp.shape == (n_keep,)
    assert np.all(np.isfinite(res.theta))
    assert np.all(np.isfinite(res.x_sampled))
    assert np.all(np.isfinite(res.lp))
    assert res.diagnostics["sigma_is_fixed"]


@pytest.mark.slow
def test_sigma_sampling_recovery():
    """Joint sigma sampling recovers theta and sigma within (scaled) tolerance
    (test/runtests.jl:57-115: sigma atol 0.3, theta atol 0.5 at 10k iters;
    here a 1k-iteration chain on a fully observed grid — the wide tolerance
    on b reflects FN's weakly identified b at this data size)."""
    t_grid, y_grid, theta_true, _ = _fn_data(n_obs=41, t_end=10.0, sigma=0.2, fill=0)
    cfg = MagiConfig(
        niter_hmc=1000,
        burnin_ratio=0.5,
        step_size_factor=0.05,
        band_size=20,
        seed=7,
        gp_optim_iterations=60,
    )
    res = solve_magi(y_grid, t_grid, FN_SYSTEM, cfg)
    assert not res.diagnostics["sigma_is_fixed"]
    sigma_mean = res.sigma.mean(axis=0)
    assert np.all(np.abs(sigma_mean - 0.2) < 0.3)
    theta_mean = res.theta.mean(axis=0)
    assert np.all(np.abs(theta_mean - theta_true) < np.array([0.5, 0.7, 1.0]))
    assert res.diagnostics["n_divergent"] == 0
    # trajectories should track the truth loosely
    assert np.all(np.isfinite(res.x_sampled))


def test_initial_params_override():
    """Full Psi_0 supply path with out-of-bounds theta clamped
    (runtests.jl:185-217, MagiJl.jl:541-569)."""
    t_grid, y_grid, _, x_at_obs = _fn_data(n_obs=9, t_end=4.0, fill=0)
    n, d = y_grid.shape
    psi0 = np.concatenate(
        [x_at_obs.T.reshape(-1), [-0.5, 0.2, 3.0], np.log([0.2, 0.2])]
    )
    cfg = MagiConfig(niter_hmc=20, burnin_ratio=0.5, seed=3, gp_optim_iterations=20)
    res = solve_magi(y_grid, t_grid, FN_SYSTEM, cfg, initial_params=psi0)
    assert res.theta.shape == (10, 3)
    assert np.all(np.isfinite(res.theta))


def test_multichain_solve():
    """n_chains > 1 concatenates chains and exposes per-chain diagnostics."""
    t_grid, y_grid, _, _ = _fn_data(n_obs=9, t_end=4.0, fill=0)
    cfg = MagiConfig(
        niter_hmc=40, burnin_ratio=0.5, n_chains=4, seed=5,
        sigma=[0.2, 0.2], phi=np.array([[1.0, 1.0], [1.5, 1.5]]),
    )
    res = solve_magi(y_grid, t_grid, FN_SYSTEM, cfg)
    assert res.theta.shape == (4 * 20, 3)
    assert res.diagnostics["n_chains"] == 4
    assert res.diagnostics["lp_per_chain"].shape == (4, 20)
    assert res.diagnostics["theta_per_chain"].shape == (4, 20, 3)
    assert res.diagnostics["final_psi"].shape[0] == 4
    # chains differ (different PRNG streams)
    assert not np.allclose(
        res.diagnostics["theta_per_chain"][0], res.diagnostics["theta_per_chain"][1]
    )


def test_unsupported_kernel_falls_back(caplog):
    """Parity MagiJl.jl:477-479: warn + default to matern52."""
    t_grid, y_grid, _, _ = _fn_data(n_obs=7, t_end=3.0, fill=0)
    cfg = MagiConfig(
        niter_hmc=10, kernel="cosine", seed=2,
        sigma=[0.2, 0.2], phi=np.array([[1.0, 1.0], [1.5, 1.5]]),
    )
    res = solve_magi(y_grid, t_grid, FN_SYSTEM, cfg)
    assert np.all(np.isfinite(res.theta))


def test_band_impl_band_through_solver():
    t_grid, y_grid, _, _ = _fn_data(n_obs=9, t_end=4.0, fill=0)
    cfg = MagiConfig(
        niter_hmc=20, band_size=4, band_impl="band", seed=4,
        sigma=[0.2, 0.2], phi=np.array([[1.0, 1.0], [1.5, 1.5]]),
    )
    res = solve_magi(y_grid, t_grid, FN_SYSTEM, cfg)
    assert np.all(np.isfinite(res.x_sampled))


def test_exogenous_x_and_theta_init():
    """:xInit and :thetaInit config paths (MagiJl.jl:403-453), including the
    out-of-bounds thetaInit clamping warning."""
    t_grid, y_grid, _, x_at_obs = _fn_data(n_obs=9, t_end=4.0, fill=0)
    cfg = MagiConfig(
        niter_hmc=20, seed=9,
        sigma=[0.2, 0.2], phi=np.array([[1.0, 1.0], [1.5, 1.5]]),
        x_init=x_at_obs,
        theta_init=[-1.0, 0.2, 3.0],  # first entry below lb=0 -> clamped
    )
    res = solve_magi(y_grid, t_grid, FN_SYSTEM, cfg)
    assert np.all(np.isfinite(res.theta))
    # wrong shapes raise
    with pytest.raises(MagiError):
        solve_magi(
            y_grid, t_grid, FN_SYSTEM,
            MagiConfig(niter_hmc=10, x_init=x_at_obs[:3],
                       sigma=[0.2, 0.2], phi=np.array([[1.0, 1.0], [1.5, 1.5]])),
        )
    with pytest.raises(MagiError):
        solve_magi(
            y_grid, t_grid, FN_SYSTEM,
            MagiConfig(niter_hmc=10, theta_init=[0.1],
                       sigma=[0.2, 0.2], phi=np.array([[1.0, 1.0], [1.5, 1.5]])),
        )


def test_derivative_fallback_kernel_runs():
    """kernel='matern-1.5': C computed, derivative blocks zero -> Kphi
    collapses to jitter*I (gaussian_process.jl:319-331) — the solve still
    runs (pure GP smoothing, no manifold constraint)."""
    import warnings

    t_grid, y_grid, _, _ = _fn_data(n_obs=7, t_end=3.0, fill=0)
    cfg = MagiConfig(
        niter_hmc=10, kernel="matern-1.5", seed=5,
        sigma=[0.2, 0.2], phi=np.array([[1.0, 1.0], [1.5, 1.5]]),
    )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        res = solve_magi(y_grid, t_grid, FN_SYSTEM, cfg)
    assert np.all(np.isfinite(res.lp))


def test_dimension_errors():
    t = np.linspace(0, 1, 5)
    y = np.zeros((5, 2))
    with pytest.raises(MagiError):
        solve_magi(y, t[:4], FN_SYSTEM, MagiConfig(niter_hmc=10))
    with pytest.raises(MagiError):
        solve_magi(
            y, t, FN_SYSTEM,
            MagiConfig(niter_hmc=10, sigma=[0.1], phi=np.ones((2, 2))),
        )
    with pytest.raises(MagiError):
        solve_magi(
            y, t, FN_SYSTEM,
            MagiConfig(niter_hmc=10),
            initial_params=np.zeros(3),
        )
