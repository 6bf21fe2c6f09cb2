"""Bounded-parameter reparameterization (Stan-style) for theta.

The reference enforces theta bounds only at initialization, never during
sampling (MagiJl.jl:413-453 — SURVEY.md section 7.4 flags this quirk), which
lets chains wander into mirror modes with negative rate constants. The
original MAGI C++ bounces off bounds inside HMC; the principled jit-friendly
equivalent is sampling an unconstrained z with theta = T(z) and the log
|dT/dz| Jacobian added to the density:

  (lb, inf):   theta = lb + exp(z)                 log-jac = z
  (-inf, ub):  theta = ub - exp(z)                 log-jac = z
  (lb, ub):    theta = lb + (ub-lb) sigmoid(z)     log-jac = log(ub-lb)
                                                   + log_sigmoid(z)
                                                   + log_sigmoid(-z)
  (-inf, inf): theta = z                           log-jac = 0
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class ThetaTransform(NamedTuple):
    """Static per-parameter branch selection (host-resolved masks)."""

    lb: np.ndarray
    ub: np.ndarray
    kind: np.ndarray  # 0 identity, 1 lower, 2 upper, 3 both


def make_theta_transform(lb, ub) -> ThetaTransform:
    lb = np.asarray(lb, dtype=np.float64)
    ub = np.asarray(ub, dtype=np.float64)
    kind = np.zeros(lb.shape, dtype=np.int32)
    kind[np.isfinite(lb) & ~np.isfinite(ub)] = 1
    kind[~np.isfinite(lb) & np.isfinite(ub)] = 2
    kind[np.isfinite(lb) & np.isfinite(ub)] = 3
    return ThetaTransform(lb=lb, ub=ub, kind=kind)


def constrain(tr: ThetaTransform, z: jnp.ndarray):
    """z -> (theta, log_jacobian). Vectorized via where (kind is static)."""
    dtype = z.dtype
    lb = jnp.asarray(np.where(np.isfinite(tr.lb), tr.lb, 0.0), dtype)
    ub = jnp.asarray(np.where(np.isfinite(tr.ub), tr.ub, 0.0), dtype)
    width = jnp.asarray(
        np.where(
            np.isfinite(tr.lb) & np.isfinite(tr.ub), tr.ub - tr.lb, 1.0
        ),
        dtype,
    )
    kind = jnp.asarray(tr.kind)

    ez = jnp.exp(z)
    sig = jax.nn.sigmoid(z)
    theta = jnp.select(
        [kind == 0, kind == 1, kind == 2, kind == 3],
        [z, lb + ez, ub - ez, lb + width * sig],
    )
    log_jac_terms = jnp.select(
        [kind == 0, kind == 1, kind == 2, kind == 3],
        [
            jnp.zeros_like(z),
            z,
            z,
            jnp.log(width) + jax.nn.log_sigmoid(z) + jax.nn.log_sigmoid(-z),
        ],
    )
    return theta, jnp.sum(log_jac_terms)


def unconstrain(tr: ThetaTransform, theta: np.ndarray) -> np.ndarray:
    """theta -> z (host-side, float64). Values at/outside bounds are nudged
    inside first."""
    theta = np.asarray(theta, dtype=np.float64).copy()
    z = theta.copy()
    for i, k in enumerate(tr.kind):
        if k == 1:
            gap = max(theta[i] - tr.lb[i], 1e-10)
            z[i] = np.log(gap)
        elif k == 2:
            gap = max(tr.ub[i] - theta[i], 1e-10)
            z[i] = np.log(gap)
        elif k == 3:
            w = tr.ub[i] - tr.lb[i]
            u = np.clip((theta[i] - tr.lb[i]) / w, 1e-10, 1 - 1e-10)
            z[i] = np.log(u) - np.log1p(-u)
    return z


def constrain_np(tr: ThetaTransform, z: np.ndarray) -> np.ndarray:
    """Vectorized host-side constrain for postprocessing sample arrays;
    z may have leading batch axes."""
    z = np.asarray(z, dtype=np.float64)
    theta = z.copy()
    for i, k in enumerate(tr.kind):
        if k == 1:
            theta[..., i] = tr.lb[i] + np.exp(z[..., i])
        elif k == 2:
            theta[..., i] = tr.ub[i] - np.exp(z[..., i])
        elif k == 3:
            w = tr.ub[i] - tr.lb[i]
            theta[..., i] = tr.lb[i] + w / (1.0 + np.exp(-z[..., i]))
    return theta
