"""ODE system contract.

Counterpart of the reference's OdeSystem struct
(/root/reference/src/ode_models.jl:5-13), redesigned for XLA:

- The ODE right-hand side is VECTORIZED over the whole time grid:
  ``f(x, theta, tvec) -> (n, D)`` with ``x`` of shape (n, D) — the reference
  evaluates ``f!(du, u, p, t)`` in a Python-style loop over n time points
  (/root/reference/src/likelihoods.jl:89-99); here one traced call covers the
  grid so XLA fuses it into the likelihood.
- Jacobians are optional: when analytic forms are not supplied they default
  to ``jax.jacfwd`` of ``f`` (exact, and the reference only hand-codes
  Jacobians for FN and Hes1 anyway — ode_models.jl:248-378). Analytic forms
  are kept for the registry models and validated against autodiff in tests.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

OdeF = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class OdeSystem:
    """An ODE system for MAGI inference.

    Fields mirror the reference struct (fOde, fOdeDx, fOdeDtheta,
    thetaLowerBound, thetaUpperBound, thetaSize):

    - ``f(x, theta, tvec)``: (n, D), (k,), (n,) -> (n, D)
    - ``f_dx(x, theta, tvec)``: -> (n, D, D), entry [i, p, j] = df_p/dx_j
    - ``f_dtheta(x, theta, tvec)``: -> (n, D, k), entry [i, p, m] = df_p/dtheta_m
    - bounds: arrays of shape (k,); enforced only at initialization, matching
      the reference (/root/reference/src/MagiJl.jl:413-453 — no constraint in
      the log-density).
    """

    f: OdeF
    theta_lower_bound: np.ndarray
    theta_upper_bound: np.ndarray
    theta_size: int
    f_dx: Optional[OdeF] = None
    f_dtheta: Optional[OdeF] = None
    name: str = "ode"

    def __post_init__(self):
        object.__setattr__(
            self, "theta_lower_bound",
            np.asarray(self.theta_lower_bound, dtype=np.float64),
        )
        object.__setattr__(
            self, "theta_upper_bound",
            np.asarray(self.theta_upper_bound, dtype=np.float64),
        )
        if self.f_dx is None:
            object.__setattr__(self, "f_dx", _autodiff_dx(self.f))
        if self.f_dtheta is None:
            object.__setattr__(self, "f_dtheta", _autodiff_dtheta(self.f))


def _autodiff_dx(f: OdeF) -> OdeF:
    def f_dx(x, theta, tvec):
        def single(xi, ti):
            return jax.jacfwd(lambda u: f(u[None, :], theta, ti[None])[0])(xi)

        return jax.vmap(single)(x, tvec)

    return f_dx


def _autodiff_dtheta(f: OdeF) -> OdeF:
    def f_dtheta(x, theta, tvec):
        def single(xi, ti):
            return jax.jacfwd(lambda th: f(xi[None, :], th, ti[None])[0])(theta)

        return jax.vmap(single)(x, tvec)

    return f_dtheta


_REGISTRY = {}


def register(system: OdeSystem) -> OdeSystem:
    _REGISTRY[system.name] = system
    return system


def get_system(name: str) -> OdeSystem:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"Unknown ODE system '{name}'. Registered: {sorted(_REGISTRY)}"
        ) from None


def registered_systems() -> Sequence[str]:
    return sorted(_REGISTRY)
