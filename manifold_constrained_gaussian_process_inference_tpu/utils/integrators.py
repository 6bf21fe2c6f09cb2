"""Fixed-step ODE integrators for test/example data generation.

The reference generates synthetic truth with DifferentialEquations.jl Tsit5
(/root/reference/run_scripts/fn_example.jl:71-73, test/runtests.jl:25-27);
integration is NEVER part of inference. Here a dense-output RK4 on a fine
fixed grid (lax.scan) fills that role.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def rk4_integrate(
    f_single: Callable,
    x0,
    t0: float,
    t1: float,
    theta,
    n_steps: int = 4000,
) -> tuple:
    """Integrate dx/dt = f(x, theta, t) with classical RK4.

    ``f_single(x (D,), theta, t) -> (D,)``. Returns (ts (n_steps+1,),
    xs (n_steps+1, D)).
    """
    x0 = jnp.asarray(x0, dtype=jnp.result_type(float))
    h = (t1 - t0) / n_steps
    ts = t0 + h * jnp.arange(n_steps + 1)

    def step(x, t):
        k1 = f_single(x, theta, t)
        k2 = f_single(x + 0.5 * h * k1, theta, t + 0.5 * h)
        k3 = f_single(x + 0.5 * h * k2, theta, t + 0.5 * h)
        k4 = f_single(x + h * k3, theta, t + h)
        x_new = x + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        return x_new, x_new

    _, xs = jax.lax.scan(step, x0, ts[:-1])
    return ts, jnp.concatenate([x0[None], xs], axis=0)


def integrate_system(system, x0, t0, t1, theta, n_steps: int = 4000):
    """RK4 over an OdeSystem (whose f is grid-vectorized)."""

    def f_single(x, th, t):
        return system.f(x[None, :], jnp.asarray(th), jnp.asarray(t)[None])[0]

    return rk4_integrate(f_single, x0, t0, t1, jnp.asarray(theta), n_steps)


def sample_on_grid(ts, xs, t_query):
    """Linear interpolation of a dense solution onto query times (host)."""
    ts = np.asarray(ts)
    xs = np.asarray(xs)
    t_query = np.asarray(t_query)
    out = np.stack(
        [np.interp(t_query, ts, xs[:, d]) for d in range(xs.shape[1])], axis=-1
    )
    return out
