"""GP prior-mean support tests.

The reference carries mu/dotmu fields but always zero
(gaussian_process.jl:244-245); the algorithm spec includes the mean. Checks:
shift invariance (data+c with gp_mean=c reproduces the zero-mean posterior
of the uncentered data) and the 'observed' mode through the solver."""
import jax.numpy as jnp
import numpy as np

import manifold_constrained_gaussian_process_inference_tpu as m
from manifold_constrained_gaussian_process_inference_tpu.config import MagiConfig
from manifold_constrained_gaussian_process_inference_tpu.inference.solve import (
    solve_magi,
)
from manifold_constrained_gaussian_process_inference_tpu.inference.target import (
    MagiTarget,
)
from manifold_constrained_gaussian_process_inference_tpu.models import FN_SYSTEM


def _problem(shift=0.0):
    rng = np.random.default_rng(0)
    n, d = 14, 2
    t = np.linspace(0, 5, n)
    x = np.stack([np.sin(t), np.cos(t)], -1)
    y = x + 0.15 * rng.normal(size=(n, d)) + shift
    phi = np.array([[1.2, 1.2], [1.0, 1.0]])
    cov = m.build_gp_cov("matern52", phi, t, bandsize=20, complexity=2)
    return t, y, cov, x


def test_zero_mean_default_matches_reference_form():
    t, y, cov, x = _problem()
    tgt0 = MagiTarget.build(y, cov, FN_SYSTEM, np.array([0.2, 0.2]),
                            (1.0, 1.0, 1.0), True)
    tgt_mu0 = MagiTarget.build(y, cov, FN_SYSTEM, np.array([0.2, 0.2]),
                               (1.0, 1.0, 1.0), True, gp_mean=np.zeros(2))
    psi = tgt0.pack(jnp.asarray(x), jnp.asarray([0.2, 0.2, 3.0]))
    assert np.isclose(
        float(tgt0.logdensity_fn()(psi)), float(tgt_mu0.logdensity_fn()(psi)),
        rtol=1e-12,
    )


def test_constant_mean_recenters_level_term():
    """With gp_mean = c the level+deriv penalty of x = truth + c equals the
    zero-mean penalty of the uncentered x (the obs term shifts with y, and
    FN's f is nonlinear, so compare with theta decoupled: set f-term via
    same centered values)."""
    t, y0, cov, x = _problem(shift=0.0)
    c = np.array([5.0, -3.0])
    y_shift = y0 + c
    x_shift = x + c

    tgt_zero = MagiTarget.build(y0, cov, FN_SYSTEM, np.array([0.2, 0.2]),
                                (1.0, 1.0, 1.0), True)
    tgt_mean = MagiTarget.build(y_shift, cov, FN_SYSTEM, np.array([0.2, 0.2]),
                                (1.0, 1.0, 1.0), True, gp_mean=c)
    theta = jnp.asarray([0.2, 0.2, 3.0])

    # Evaluate with the ODE term silenced by comparing differences in x only:
    # ll(x + dx) - ll(x) must match between the two targets when dx is the
    # same (level/obs terms are quadratic and identically centered).
    dx = 0.01 * np.arange(x.size, dtype=float).reshape(x.shape)
    ld0 = tgt_zero.logdensity_fn()
    ldm = tgt_mean.logdensity_fn()

    # The GP level and obs terms agree exactly; the ODE deriv term differs
    # because f(x + c) != f(x) for FN. Verify the two agree when the ODE
    # contribution is removed by using beta_deriv -> infinity.
    tgt_zero_nd = MagiTarget.build(y0, cov, FN_SYSTEM, np.array([0.2, 0.2]),
                                   (1e18, 1.0, 1.0), True)
    tgt_mean_nd = MagiTarget.build(y_shift, cov, FN_SYSTEM, np.array([0.2, 0.2]),
                                   (1e18, 1.0, 1.0), True, gp_mean=c)
    a0 = tgt_zero_nd.logdensity_fn()(tgt_zero_nd.pack(jnp.asarray(x), theta))
    a1 = tgt_zero_nd.logdensity_fn()(tgt_zero_nd.pack(jnp.asarray(x + dx), theta))
    b0 = tgt_mean_nd.logdensity_fn()(tgt_mean_nd.pack(jnp.asarray(x_shift), theta))
    b1 = tgt_mean_nd.logdensity_fn()(tgt_mean_nd.pack(jnp.asarray(x_shift + dx), theta))
    assert np.isclose(float(a0), float(b0), rtol=1e-8)
    assert np.isclose(float(a1 - a0), float(b1 - b0), rtol=1e-7)


def test_solver_observed_mean_mode():
    t, y, cov, x = _problem(shift=4.0)
    cfg = MagiConfig(
        niter_hmc=30, seed=3, gp_mean="observed",
        sigma=[0.2, 0.2], phi=np.array([[1.2, 1.2], [1.0, 1.0]]),
    )
    res = solve_magi(y, t, FN_SYSTEM, cfg)
    assert np.all(np.isfinite(res.theta))
    # trajectories live near the shifted data, not near zero
    assert abs(res.x_sampled[:, :, 0].mean() - y[:, 0].mean()) < 2.0
