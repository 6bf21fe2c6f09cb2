"""The MAGI posterior target: packing, unpacking, and the jit'd
value-and-grad closure consumed by NUTS.

Counterpart of MagiTarget + the LogDensityProblems adapter
(/root/reference/src/logdensityproblems_interface.jl:33-267). Instead of a
struct implementing an interface, the target is a plain function
``psi -> (logdensity, grad)`` closed over static device data; the
fixed-vs-sampled-sigma switch is a STATIC flag producing two different
compiled programs (different Psi layouts), never a runtime branch.

Psi layout (parity with the reference's initial_params contract,
MagiJl.jl:526-569): [vec(X) column-major (n*D); theta (k); log_sigma (D) if
sigma is sampled]. Column-major vec matches Julia's ``vec(x_init)``.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.base import OdeSystem
from ..ops.gp_cov import GPCov
from ..ops.likelihood import (
    BandedLikelihoodData,
    LikelihoodData,
    log_posterior,
    log_posterior_banded,
    make_banded_likelihood_data,
    make_likelihood_data,
)

LOG_SIGMA_CLAMP = 15.0  # parity: logdensityproblems_interface.jl:134,200


@dataclasses.dataclass(frozen=True)
class MagiTarget:
    """Bundles the problem for sampling.

    ``sigma_init`` is the fixed sigma when ``sigma_is_fixed`` else only the
    initialization value (parity: logdensityproblems_interface.jl:39,122-145).
    """

    system: OdeSystem
    data: object  # LikelihoodData | BandedLikelihoodData
    sigma_init: jnp.ndarray
    n_times: int
    n_dims: int
    n_params_ode: int
    sigma_is_fixed: bool
    bandwidth: int = 0
    use_pallas: bool = False
    # Optional bounded reparameterization of theta (inference/transforms.py).
    # None -> theta sampled unconstrained (reference parity).
    # (Psi-level Laplace whitening lives OUTSIDE the target —
    # inference/whiten.py wraps the value-and-grad closure.)
    theta_transform: object = None

    @classmethod
    def build(
        cls,
        yobs: np.ndarray,
        gp_cov: GPCov,
        system: OdeSystem,
        sigma_init,
        prior_temperature,
        sigma_is_fixed: bool,
        dtype=None,
        band_impl: str = "dense",
        theta_transform=None,
        gp_mean=None,
        gp_mean_deriv=None,
    ) -> "MagiTarget":
        """band_impl selects the hot-path memory layout:
        - "dense": (D, n, n) band-masked dense einsums (MXU; best for
          moderate n)
        - "band": (D, 2b+1, n) diagonal storage, XLA roll contraction
        - "pallas": band storage through the Pallas TPU kernel

        ``theta_transform``: a transforms.ThetaTransform to sample theta on
        an unconstrained scale with bounds enforced (None = reference
        parity: unconstrained, bounds only at init).
        """
        if band_impl == "dense":
            data = make_likelihood_data(
                yobs, gp_cov, prior_temperature, dtype=dtype,
                mu=gp_mean, dotmu=gp_mean_deriv,
            )
        elif band_impl in ("band", "pallas"):
            data = make_banded_likelihood_data(
                yobs, gp_cov, prior_temperature, dtype=dtype,
                mu=gp_mean, dotmu=gp_mean_deriv,
            )
        else:
            raise ValueError(f"unknown band_impl '{band_impl}'")
        n, d = np.asarray(yobs).shape
        return cls(
            system=system,
            data=data,
            sigma_init=jnp.asarray(
                np.asarray(sigma_init, dtype=np.float64), dtype=data.mask.dtype
            ),
            n_times=n,
            n_dims=d,
            n_params_ode=system.theta_size,
            sigma_is_fixed=sigma_is_fixed,
            bandwidth=gp_cov.bandsize,
            use_pallas=band_impl == "pallas",
            theta_transform=theta_transform,
        )

    @property
    def dimension(self) -> int:
        """Sampled dimension: n*D + k (+ D when sigma is sampled).

        Parity: logdensityproblems_interface.jl:53-61."""
        dim = self.n_times * self.n_dims + self.n_params_ode
        if not self.sigma_is_fixed:
            dim += self.n_dims
        return dim

    # -- packing ------------------------------------------------------------

    def pack(self, x, theta, log_sigma=None) -> jnp.ndarray:
        parts = [jnp.asarray(x).T.reshape(-1), jnp.asarray(theta).reshape(-1)]
        if not self.sigma_is_fixed:
            if log_sigma is None:
                raise ValueError("log_sigma required when sigma is sampled")
            parts.append(jnp.asarray(log_sigma).reshape(-1))
        return jnp.concatenate(parts)

    def unpack(self, psi) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
        """psi -> (x (n, D), theta (k,), log_sigma (D,) or None)."""
        n, d, k = self.n_times, self.n_dims, self.n_params_ode
        x = psi[: n * d].reshape(d, n).T  # column-major unvec
        theta = psi[n * d : n * d + k]
        if self.sigma_is_fixed:
            return x, theta, None
        return x, theta, psi[n * d + k :]

    # -- densities ----------------------------------------------------------

    def logdensity_fn(self) -> Callable[[jnp.ndarray], jnp.ndarray]:
        """Pure scalar log-posterior over the packed Psi vector.

        Sampled-sigma mode transforms sigma = exp(clamp(log_sigma, +-15)) and
        adds the log-Jacobian sum(log_sigma) — an implicit 1/sigma prior
        (parity: logdensityproblems_interface.jl:111-166).
        """
        data, system = self.data, self.system
        sigma_fixed = self.sigma_init
        fixed = self.sigma_is_fixed
        unpack = self.unpack
        banded = isinstance(data, BandedLikelihoodData)
        bandwidth, use_pallas = self.bandwidth, self.use_pallas
        transform = self.theta_transform

        def logdensity(psi):
            x, theta, log_sigma = unpack(psi)
            jac = jnp.zeros((), dtype=psi.dtype)
            if transform is not None:
                from .transforms import constrain

                theta, theta_jac = constrain(transform, theta)
                jac = jac + theta_jac
            if fixed:
                sigma = sigma_fixed
            else:
                clamped = jnp.clip(log_sigma, -LOG_SIGMA_CLAMP, LOG_SIGMA_CLAMP)
                sigma = jnp.exp(clamped)
                jac = jac + jnp.sum(clamped)
            if banded:
                ll = log_posterior_banded(
                    x, theta, sigma, data, system.f, bandwidth, use_pallas
                )
            else:
                ll = log_posterior(x, theta, sigma, data, system.f)
            return ll + jac

        return logdensity

    def value_and_grad_fn(self) -> Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]:
        """Fused value-and-grad of the log-posterior — ONE jit region.

        This is the whole of the reference's per-leapfrog-step call tree
        (SURVEY.md section 3.2) as a single XLA computation. Non-finite
        values are NOT asserted on (the reference sampler throws,
        samplers.jl:58-60); NUTS treats them as divergences.
        """
        return jax.value_and_grad(self.logdensity_fn())
