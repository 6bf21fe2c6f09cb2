"""Benchmark ODE systems.

Vectorized re-derivations of the reference model zoo
(/root/reference/src/ode_models.jl): FitzHugh-Nagumo, Hes1, log-Hes1 (plus
fixed-gamma and fixed-f variants), HIV (log states), and protein
transduction. Each ``f`` maps (n, D) states -> (n, D) derivatives in one
traced call. Analytic Jacobians are provided where the reference has them
(FN, Hes1: ode_models.jl:248-378); the rest default to autodiff.

Default theta bounds follow the reference example usage (all params >= 0,
unbounded above; run_scripts/fn_example.jl:127-129).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import OdeSystem, register

_INF = np.inf


# ---------------------------------------------------------------------------
# FitzHugh-Nagumo (2 states V, R; 3 params a, b, c)
# Parity: fn_ode! /root/reference/src/ode_models.jl:39-47
# ---------------------------------------------------------------------------

def fn_f(x, theta, tvec):
    v, r = x[:, 0], x[:, 1]
    a, b, c = theta[0], theta[1], theta[2]
    dv = c * (v - v**3 / 3.0 + r)
    dr = -1.0 / c * (v - a + b * r)
    return jnp.stack([dv, dr], axis=-1)


def fn_f_dx(x, theta, tvec):
    """J[i, p, j] = df_p/dx_j. Parity: fn_ode_dx! ode_models.jl:248-262."""
    v = x[:, 0]
    a, b, c = theta[0], theta[1], theta[2]
    n = x.shape[0]
    j = jnp.zeros((n, 2, 2), dtype=x.dtype)
    j = j.at[:, 0, 0].set(c * (1.0 - v**2))
    j = j.at[:, 0, 1].set(c)
    j = j.at[:, 1, 0].set(-1.0 / c)
    j = j.at[:, 1, 1].set(-b / c)
    return j


def fn_f_dtheta(x, theta, tvec):
    """J[i, p, m] = df_p/dtheta_m. Parity: fn_ode_dtheta ode_models.jl:274-299."""
    v, r = x[:, 0], x[:, 1]
    a, b, c = theta[0], theta[1], theta[2]
    n = x.shape[0]
    j = jnp.zeros((n, 2, 3), dtype=x.dtype)
    j = j.at[:, 0, 2].set(v - v**3 / 3.0 + r)
    j = j.at[:, 1, 0].set(1.0 / c)
    j = j.at[:, 1, 1].set(-r / c)
    j = j.at[:, 1, 2].set((v - a + b * r) / c**2)
    return j


FN_SYSTEM = register(
    OdeSystem(
        f=fn_f, f_dx=fn_f_dx, f_dtheta=fn_f_dtheta,
        theta_lower_bound=[0.0, 0.0, 0.0],
        theta_upper_bound=[_INF, _INF, _INF],
        theta_size=3, name="fn",
    )
)


# ---------------------------------------------------------------------------
# Hes1 (3 states P, M, H; 7 params)
# Parity: hes1_ode! ode_models.jl:60-70
# ---------------------------------------------------------------------------

def hes1_f(x, theta, tvec):
    p, m, h = x[:, 0], x[:, 1], x[:, 2]
    t1, t2, t3, t4, t5, t6, t7 = (theta[i] for i in range(7))
    one_p2 = 1.0 + p**2
    dp = -t1 * p * h + t2 * m - t3 * p
    dm = -t4 * m + t5 / one_p2
    dh = -t1 * p * h + t6 / one_p2 - t7 * h
    return jnp.stack([dp, dm, dh], axis=-1)


def hes1_f_dx(x, theta, tvec):
    """Parity: hes1_ode_dx! ode_models.jl:312-336."""
    p, m, h = x[:, 0], x[:, 1], x[:, 2]
    t1, t2, t3, t4, t5, t6, t7 = (theta[i] for i in range(7))
    one_p2 = 1.0 + p**2
    n = x.shape[0]
    j = jnp.zeros((n, 3, 3), dtype=x.dtype)
    j = j.at[:, 0, 0].set(-t1 * h - t3)
    j = j.at[:, 0, 1].set(jnp.full((n,), t2, dtype=x.dtype))
    j = j.at[:, 0, 2].set(-t1 * p)
    j = j.at[:, 1, 0].set(-t5 * 2.0 * p / one_p2**2)
    j = j.at[:, 1, 1].set(jnp.full((n,), -t4, dtype=x.dtype))
    j = j.at[:, 2, 0].set(-t1 * h - t6 * 2.0 * p / one_p2**2)
    j = j.at[:, 2, 2].set(-t1 * p - t7)
    return j


def hes1_f_dtheta(x, theta, tvec):
    """Parity: hes1_ode_dtheta ode_models.jl:349-378."""
    p, m, h = x[:, 0], x[:, 1], x[:, 2]
    one_p2 = 1.0 + p**2
    n = x.shape[0]
    j = jnp.zeros((n, 3, 7), dtype=x.dtype)
    j = j.at[:, 0, 0].set(-p * h)
    j = j.at[:, 0, 1].set(m)
    j = j.at[:, 0, 2].set(-p)
    j = j.at[:, 1, 3].set(-m)
    j = j.at[:, 1, 4].set(1.0 / one_p2)
    j = j.at[:, 2, 0].set(-p * h)
    j = j.at[:, 2, 5].set(1.0 / one_p2)
    j = j.at[:, 2, 6].set(-h)
    return j


HES1_SYSTEM = register(
    OdeSystem(
        f=hes1_f, f_dx=hes1_f_dx, f_dtheta=hes1_f_dtheta,
        theta_lower_bound=np.zeros(7),
        theta_upper_bound=np.full(7, _INF),
        theta_size=7, name="hes1",
    )
)


# ---------------------------------------------------------------------------
# log-Hes1 (states are log P, log M, log H; 7 params)
# Parity: hes1log_ode! ode_models.jl:83-103
# ---------------------------------------------------------------------------

def hes1log_f(x, theta, tvec):
    p = jnp.exp(x[:, 0])
    m = jnp.exp(x[:, 1])
    h = jnp.exp(x[:, 2])
    t1, t2, t3, t4, t5, t6, t7 = (theta[i] for i in range(7))
    one_p2 = 1.0 + p**2
    dlp = -t1 * h + t2 * m / p - t3
    dlm = -t4 + t5 / (one_p2 * m)
    dlh = -t1 * p + t6 / (one_p2 * h) - t7
    return jnp.stack([dlp, dlm, dlh], axis=-1)


HES1LOG_SYSTEM = register(
    OdeSystem(
        f=hes1log_f,
        theta_lower_bound=np.zeros(7),
        theta_upper_bound=np.full(7, _INF),
        theta_size=7, name="hes1log",
    )
)


# log-Hes1 with gamma fixed at 0.3 (6 params).
# Parity: hes1log_ode_fixg! ode_models.jl:116-135

def hes1log_fixg_f(x, theta, tvec):
    p = jnp.exp(x[:, 0])
    m = jnp.exp(x[:, 1])
    h = jnp.exp(x[:, 2])
    t1, t2, t3, t4, t5, t6 = (theta[i] for i in range(6))
    one_p2 = 1.0 + p**2
    dlp = -t1 * h + t2 * m / p - t3
    dlm = -t4 + t5 / (one_p2 * m)
    dlh = -t1 * p + t6 / (one_p2 * h) - 0.3
    return jnp.stack([dlp, dlm, dlh], axis=-1)


HES1LOG_FIXG_SYSTEM = register(
    OdeSystem(
        f=hes1log_fixg_f,
        theta_lower_bound=np.zeros(6),
        theta_upper_bound=np.full(6, _INF),
        theta_size=6, name="hes1log_fixg",
    )
)


# log-Hes1 with f fixed at 20.0 (6 params; last param is gamma).
# Parity: hes1log_ode_fixf! ode_models.jl:147-165

def hes1log_fixf_f(x, theta, tvec):
    p = jnp.exp(x[:, 0])
    m = jnp.exp(x[:, 1])
    h = jnp.exp(x[:, 2])
    t1, t2, t3, t4, t5, t6 = (theta[i] for i in range(6))
    one_p2 = 1.0 + p**2
    dlp = -t1 * h + t2 * m / p - t3
    dlm = -t4 + t5 / (one_p2 * m)
    dlh = -t1 * p + 20.0 / (one_p2 * h) - t6
    return jnp.stack([dlp, dlm, dlh], axis=-1)


HES1LOG_FIXF_SYSTEM = register(
    OdeSystem(
        f=hes1log_fixf_f,
        theta_lower_bound=np.zeros(6),
        theta_upper_bound=np.full(6, _INF),
        theta_size=6, name="hes1log_fixf",
    )
)


# ---------------------------------------------------------------------------
# HIV (log states log T, log Tm, log Tw, log Tmw; 9 params; 1e-6 scale)
# Parity: hiv_ode! ode_models.jl:178-207
# ---------------------------------------------------------------------------

def hiv_f(x, theta, tvec):
    t_ = jnp.exp(x[:, 0])
    tm = jnp.exp(x[:, 1])
    tw = jnp.exp(x[:, 2])
    tmw = jnp.exp(x[:, 3])
    p = [theta[i] for i in range(9)]
    sf = 1e-6
    d1 = p[0] - sf * p[1] * tm - sf * p[2] * tw - sf * p[3] * tmw
    d2 = p[6] + sf * p[1] * t_ - sf * p[4] * tw + sf * 0.25 * p[3] * tmw * t_ / tm
    d3 = p[7] + sf * p[2] * t_ - sf * p[5] * tm + sf * 0.25 * p[3] * tmw * t_ / tw
    d4 = p[8] + 0.5 * sf * p[3] * t_ + (sf * p[4] + sf * p[5]) * tw * tm / tmw
    return jnp.stack([d1, d2, d3, d4], axis=-1)


HIV_SYSTEM = register(
    OdeSystem(
        f=hiv_f,
        theta_lower_bound=np.full(9, -_INF),
        theta_upper_bound=np.full(9, _INF),
        theta_size=9, name="hiv",
    )
)


# ---------------------------------------------------------------------------
# Protein transduction (5 states S, dS, R, RS, RPP; 6 params)
# Parity: ptrans_ode! ode_models.jl:219-233
# ---------------------------------------------------------------------------

def ptrans_f(x, theta, tvec):
    s, r, rs, rpp = x[:, 0], x[:, 2], x[:, 3], x[:, 4]
    p = [theta[i] for i in range(6)]
    mm = p[4] * rpp / (p[5] + rpp)
    d1 = -p[0] * s - p[1] * s * r + p[2] * rs
    d2 = p[0] * s
    d3 = -p[1] * s * r + p[2] * rs + mm
    d4 = p[1] * s * r - p[2] * rs - p[3] * rs
    d5 = p[3] * rs - mm
    return jnp.stack([d1, d2, d3, d4, d5], axis=-1)


PTRANS_SYSTEM = register(
    OdeSystem(
        f=ptrans_f,
        theta_lower_bound=np.zeros(6),
        theta_upper_bound=np.full(6, _INF),
        theta_size=6, name="ptrans",
    )
)
