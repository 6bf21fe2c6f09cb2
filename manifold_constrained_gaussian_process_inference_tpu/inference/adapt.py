"""Stan-style warmup adaptation: dual-averaging step size + windowed
diagonal (Welford) mass-matrix estimation.

TPU-native counterpart of the reference's StanHMCAdaptor(MassMatrixAdaptor,
StepSizeAdaptor) (/root/reference/src/samplers.jl:166-167): the same
algorithms re-implemented as pure JAX state transitions so they live inside
the warmup lax.scan and batch across vmapped chains.

Dual averaging (Hoffman & Gelman 2014, Algorithm 6 / Nesterov):
  gamma=0.05, t0=10, kappa=0.75, mu = log(10 * eps0).
Mass windows (Stan): init_buffer=75 (step size only), expanding windows
25, 50, 100, ... for variance estimation, term_buffer=50 (step size only).
At every window end the inverse metric is set to the regularized sample
variance and both Welford and dual averaging restart.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np


class DualAveragingState(NamedTuple):
    log_eps: jnp.ndarray      # current log step size
    log_eps_avg: jnp.ndarray  # averaged iterate (used after warmup)
    h_bar: jnp.ndarray
    mu: jnp.ndarray
    count: jnp.ndarray        # steps since (re)start


def da_init(eps0: jnp.ndarray) -> DualAveragingState:
    log_eps = jnp.log(eps0)
    z = jnp.zeros_like(log_eps)
    return DualAveragingState(
        log_eps=log_eps,
        log_eps_avg=log_eps,
        h_bar=z,
        mu=jnp.log(10.0) + log_eps,
        count=jnp.zeros_like(log_eps),
    )


def da_update(
    state: DualAveragingState, accept_prob: jnp.ndarray, target_accept: float,
    gamma: float = 0.05, t0: float = 10.0, kappa: float = 0.75,
) -> DualAveragingState:
    t = state.count + 1.0
    eta_h = 1.0 / (t + t0)
    h_bar = (1.0 - eta_h) * state.h_bar + eta_h * (target_accept - accept_prob)
    log_eps = state.mu - jnp.sqrt(t) / gamma * h_bar
    eta = t ** (-kappa)
    log_eps_avg = eta * log_eps + (1.0 - eta) * state.log_eps_avg
    return DualAveragingState(log_eps, log_eps_avg, h_bar, state.mu, t)


def da_restart(state: DualAveragingState) -> DualAveragingState:
    """Restart after a mass-matrix update, re-centering mu on the current
    step size (Stan's behavior)."""
    return da_init(jnp.exp(state.log_eps))


class WelfordState(NamedTuple):
    count: jnp.ndarray  # scalar
    mean: jnp.ndarray   # (dim,)
    m2: jnp.ndarray     # (dim,)


def welford_init(dim: int, dtype) -> WelfordState:
    return WelfordState(
        count=jnp.zeros((), dtype=dtype),
        mean=jnp.zeros((dim,), dtype=dtype),
        m2=jnp.zeros((dim,), dtype=dtype),
    )


def welford_update(state: WelfordState, x: jnp.ndarray) -> WelfordState:
    count = state.count + 1.0
    delta = x - state.mean
    mean = state.mean + delta / count
    m2 = state.m2 + delta * (x - mean)
    return WelfordState(count, mean, m2)


def welford_variance_regularized(state: WelfordState) -> jnp.ndarray:
    """Stan's shrunk variance estimate: (n/(n+5)) var + 1e-3 (5/(n+5))."""
    n = state.count
    var = state.m2 / jnp.maximum(n - 1.0, 1.0)
    w = n / (n + 5.0)
    return w * var + 1e-3 * (1.0 - w)


def build_window_schedule(
    n_adapts: int,
    init_buffer: int = 75,
    term_buffer: int = 50,
    base_window: int = 25,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side (static) schedule over warmup steps.

    Returns (in_window, window_end): boolean arrays of length n_adapts.
    ``in_window[t]`` — accumulate the draw into Welford at step t;
    ``window_end[t]`` — after step t, refresh the metric and restart.
    Degenerate short warmups collapse to a single window, like Stan.
    """
    in_window = np.zeros(n_adapts, dtype=bool)
    window_end = np.zeros(n_adapts, dtype=bool)
    if n_adapts <= 0:
        return in_window, window_end
    if n_adapts < init_buffer + term_buffer + base_window:
        # Too short for the full scheme: single window over the middle.
        start = min(init_buffer, max(n_adapts // 4, 1))
        end = max(n_adapts - max(n_adapts // 10, 1), start + 1)
        end = min(end, n_adapts)
        in_window[start:end] = True
        window_end[end - 1] = True
        return in_window, window_end
    start = init_buffer
    last = n_adapts - term_buffer
    size = base_window
    while start < last:
        end = start + size
        # final window absorbs the remainder
        if end + 2 * size > last:
            end = last
        in_window[start:end] = True
        window_end[end - 1] = True
        start = end
        size *= 2
    return in_window, window_end
