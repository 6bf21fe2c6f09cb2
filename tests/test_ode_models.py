"""ODE model zoo tests — hand-computed values + Jacobian cross-checks,
mirroring the reference's test/test_ode_models.jl (hand values :20-121,
:264-328; integration sanity :330-407). Analytic Jacobians are additionally
validated against autodiff (the TPU framework's default path)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manifold_constrained_gaussian_process_inference_tpu.models import (
    FN_SYSTEM,
    HES1_SYSTEM,
    HES1LOG_FIXF_SYSTEM,
    HES1LOG_FIXG_SYSTEM,
    HES1LOG_SYSTEM,
    HIV_SYSTEM,
    PTRANS_SYSTEM,
    get_system,
)
from manifold_constrained_gaussian_process_inference_tpu.models.base import (
    _autodiff_dtheta,
    _autodiff_dx,
)
from manifold_constrained_gaussian_process_inference_tpu.utils.integrators import (
    integrate_system,
)


def test_fn_hand_values():
    # du1 = c(V - V^3/3 + R), du2 = -(V - a + bR)/c  (ode_models.jl:39-47)
    x = jnp.array([[1.0, 0.5]])
    theta = jnp.array([0.2, 0.2, 3.0])
    t = jnp.array([0.0])
    du = np.asarray(FN_SYSTEM.f(x, theta, t))[0]
    v, r = 1.0, 0.5
    a, b, c = 0.2, 0.2, 3.0
    assert np.isclose(du[0], c * (v - v**3 / 3 + r))
    assert np.isclose(du[1], -(v - a + b * r) / c)


def test_hes1_hand_values():
    x = jnp.array([[1.4, 2.0, 7.9]])
    theta = jnp.array([0.022, 0.3, 0.031, 0.028, 0.5, 20.0, 0.3])
    du = np.asarray(HES1_SYSTEM.f(x, theta, jnp.array([0.0])))[0]
    p, m, h = 1.4, 2.0, 7.9
    t1, t2, t3, t4, t5, t6, t7 = np.asarray(theta)
    assert np.isclose(du[0], -t1 * p * h + t2 * m - t3 * p)
    assert np.isclose(du[1], -t4 * m + t5 / (1 + p**2))
    assert np.isclose(du[2], -t1 * p * h + t6 / (1 + p**2) - t7 * h)


def test_hes1log_consistency_with_hes1():
    """d(log X)/dt from hes1log equals (dX/dt)/X from hes1
    (ode_models.jl:83-103)."""
    p, m, h = 1.4, 2.0, 7.9
    theta = jnp.array([0.022, 0.3, 0.031, 0.028, 0.5, 20.0, 0.3])
    x = jnp.array([[p, m, h]])
    xlog = jnp.log(x)
    du = np.asarray(HES1_SYSTEM.f(x, theta, jnp.array([0.0])))[0]
    dulog = np.asarray(HES1LOG_SYSTEM.f(xlog, theta, jnp.array([0.0])))[0]
    # Tolerance note: XLA CPU evaluates exp/log on arrays of size <= 2 with
    # ~float32 accuracy even under x64 (verified empirically); 1e-6 instead
    # of 1e-12 covers that without weakening the algebraic check.
    assert np.allclose(dulog, du / np.array([p, m, h]), rtol=1e-6, atol=1e-7)


def test_hes1log_fixed_variants():
    p, m, h = 1.4, 2.0, 7.9
    xlog = jnp.log(jnp.array([[p, m, h]]))
    t0 = jnp.array([0.0])
    th_full = jnp.array([0.022, 0.3, 0.031, 0.028, 0.5, 20.0, 0.3])
    full = np.asarray(HES1LOG_SYSTEM.f(xlog, th_full, t0))[0]
    # fixg: gamma = theta7 = 0.3 hard-coded, 6 free params
    fixg = np.asarray(
        HES1LOG_FIXG_SYSTEM.f(xlog, th_full[:6], t0)
    )[0]
    assert np.allclose(fixg, full, rtol=1e-6, atol=1e-7)
    # fixf: f = theta6 = 20.0 hard-coded, last free param is gamma
    th_fixf = jnp.array([0.022, 0.3, 0.031, 0.028, 0.5, 0.3])
    fixf = np.asarray(HES1LOG_FIXF_SYSTEM.f(xlog, th_fixf, t0))[0]
    assert np.allclose(fixf, full, rtol=1e-6, atol=1e-7)


def test_hiv_hand_values():
    # (ode_models.jl:178-207)
    logs = jnp.log(jnp.array([[600.0, 30.0, 20.0, 8.0]]))
    theta = jnp.array([36.0, 0.108, 0.5, 1e3, 1e3, 1e3, -0.2, -0.3, -0.5])
    du = np.asarray(HIV_SYSTEM.f(logs, theta, jnp.array([0.0])))[0]
    t_, tm, tw, tmw = 600.0, 30.0, 20.0, 8.0
    p = np.asarray(theta)
    sf = 1e-6
    assert np.isclose(du[0], p[0] - sf * p[1] * tm - sf * p[2] * tw - sf * p[3] * tmw)
    assert np.isclose(
        du[1], p[6] + sf * p[1] * t_ - sf * p[4] * tw + sf * 0.25 * p[3] * tmw * t_ / tm
    )
    assert np.isclose(
        du[2], p[7] + sf * p[2] * t_ - sf * p[5] * tm + sf * 0.25 * p[3] * tmw * t_ / tw
    )
    assert np.isclose(
        du[3], p[8] + 0.5 * sf * p[3] * t_ + (sf * p[4] + sf * p[5]) * tw * tm / tmw
    )


def test_ptrans_hand_values():
    # (ode_models.jl:219-233)
    x = jnp.array([[1.0, 0.0, 1.2, 0.3, 0.4]])
    theta = jnp.array([0.07, 0.6, 0.05, 0.3, 0.017, 0.3])
    du = np.asarray(PTRANS_SYSTEM.f(x, theta, jnp.array([0.0])))[0]
    s, r, rs, rpp = 1.0, 1.2, 0.3, 0.4
    p = np.asarray(theta)
    mm = p[4] * rpp / (p[5] + rpp)
    assert np.isclose(du[0], -p[0] * s - p[1] * s * r + p[2] * rs)
    assert np.isclose(du[1], p[0] * s)
    assert np.isclose(du[2], -p[1] * s * r + p[2] * rs + mm)
    assert np.isclose(du[3], p[1] * s * r - p[2] * rs - p[3] * rs)
    assert np.isclose(du[4], p[3] * rs - mm)


@pytest.mark.parametrize(
    "system,x,theta",
    [
        (FN_SYSTEM, [[-1.0, 1.0], [0.3, 0.8]], [0.2, 0.2, 3.0]),
        (
            HES1_SYSTEM,
            [[1.4, 2.0, 7.9], [0.7, 1.1, 3.3]],
            [0.022, 0.3, 0.031, 0.028, 0.5, 20.0, 0.3],
        ),
    ],
)
def test_analytic_jacobians_match_autodiff(system, x, theta):
    """The hand-coded Jacobians (parity with ode_models.jl:248-378) must
    agree with jacfwd of f — this also certifies the framework's autodiff
    gradient path."""
    x = jnp.asarray(x, dtype=jnp.float64)
    theta = jnp.asarray(theta, dtype=jnp.float64)
    t = jnp.zeros(x.shape[0], dtype=jnp.float64)
    jx_analytic = np.asarray(system.f_dx(x, theta, t))
    jx_auto = np.asarray(_autodiff_dx(system.f)(x, theta, t))
    assert np.allclose(jx_analytic, jx_auto, rtol=1e-10, atol=1e-12)
    jt_analytic = np.asarray(system.f_dtheta(x, theta, t))
    jt_auto = np.asarray(_autodiff_dtheta(system.f)(x, theta, t))
    assert np.allclose(jt_analytic, jt_auto, rtol=1e-10, atol=1e-12)


def test_registry():
    assert get_system("fn") is FN_SYSTEM
    with pytest.raises(KeyError):
        get_system("nope")


def test_fn_integration_sanity():
    """RK4 FN trajectory: derivative of the solution matches f numerically
    (central difference cross-check, test_ode_models.jl:330-407)."""
    theta = jnp.array([0.2, 0.2, 3.0])
    ts, xs = integrate_system(FN_SYSTEM, [-1.0, 1.0], 0.0, 10.0, theta, n_steps=2000)
    ts, xs = np.asarray(ts), np.asarray(xs)
    # FN oscillates and stays bounded
    assert np.all(np.isfinite(xs))
    assert np.abs(xs).max() < 5.0
    mid = 700
    h = ts[1] - ts[0]
    fd = (xs[mid + 1] - xs[mid - 1]) / (2 * h)
    f_val = np.asarray(
        FN_SYSTEM.f(jnp.asarray(xs[mid : mid + 1]), theta, jnp.asarray(ts[mid : mid + 1]))
    )[0]
    assert np.allclose(fd, f_val, rtol=1e-3, atol=1e-4)
