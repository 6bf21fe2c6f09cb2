"""Numerical sanitizers (debug mode).

Counterpart of the reference's non-finite guards — gradient warnings
(likelihoods.jl:250-254), density guards
(logdensityproblems_interface.jl:160-165), sampler asserts
(samplers.jl:58-60) — implemented as trace-safe instrumentation: a wrapper
around the fused value-and-grad that reports non-finite values via
jax.debug.print without aborting (NUTS already treats them as divergences).
Zero overhead when not enabled.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def nan_guard(vg: Callable, name: str = "logdensity") -> Callable:
    """Wrap a psi -> (value, grad) function with non-finite reporting."""

    def wrapped(psi):
        value, grad = vg(psi)
        bad_v = ~jnp.isfinite(value)
        bad_g = ~jnp.all(jnp.isfinite(grad))
        jax.lax.cond(
            bad_v | bad_g,
            lambda: jax.debug.print(
                "[nan-guard:{}] non-finite: value={}, n_bad_grad={}",
                name, value, jnp.sum(~jnp.isfinite(grad)),
            ),
            lambda: None,
        )
        return value, grad

    return wrapped


def checkify_value_and_grad(vg: Callable):
    """checkify-based variant: returns (err, (value, grad)) so callers can
    raise on host. Use in tests/debugging only (adds error plumbing)."""
    from jax.experimental import checkify

    def checked(psi):
        value, grad = vg(psi)
        checkify.check(jnp.isfinite(value), "non-finite log-density")
        checkify.check(
            jnp.all(jnp.isfinite(grad)), "non-finite gradient entries"
        )
        return value, grad

    return checkify.checkify(checked)
