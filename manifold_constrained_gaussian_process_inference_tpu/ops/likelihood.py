"""The MAGI log-posterior — the hot path.

Counterpart of log_likelihood_and_gradient_banded
(/root/reference/src/likelihoods.jl:43-257), redesigned TPU-first:

- The reference loops over dimensions (likelihoods.jl:111,168) and over time
  points for the Jacobian accumulation (:199-222). Here every term is a
  batched tensor contraction over the (D, n, n) band-masked stacks — XLA maps
  them onto the MXU and fuses the elementwise epilogue.
- The reference hand-derives the gradient. Here the scalar value is written
  once and the gradient is exact reverse-mode autodiff of that value — the
  VJP of the vectorized ODE ``f`` reproduces the reference's analytic
  J_x/J_theta accumulation (validated against the hand-coded Jacobians and
  finite differences in tests/test_likelihood.py).

Three tempered terms per dimension d (Documentation of Algorithm.pdf sec. 2):
  ll_obs   = -[ SSE_d / sigma_d^2 + N_d log(2 pi sigma_d^2) ] / 2   (finite obs only)
  ll_deriv = -(f_d - mphi_d x_d)^T Kinv_d (f_d - mphi_d x_d) / 2
  ll_level = -x_d^T Cinv_d x_d / 2
  ll = sum_d [ ll_obs/beta_obs + ll_deriv/beta_deriv + ll_level/beta_level ]
with beta = prior_temperature = [beta_deriv, beta_level, beta_obs]
(likelihoods.jl:139-152).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .gp_cov import GPCov

LOG_2PI = float(np.log(2.0 * np.pi))


class LikelihoodData(NamedTuple):
    """Static device data for the likelihood (everything except x/theta/sigma).

    yobs_filled: (n, D) observations with NaN replaced by 0
    mask:        (n, D) 1.0 where the observation is finite, else 0.0
    nobs:        (D,)   number of finite observations per dimension
    tvec:        (n,)
    Cinv, mphi, Kinv: (D, n, n) band-masked stacks
    beta:        (3,)   [beta_deriv, beta_level, beta_obs]
    """

    yobs_filled: jnp.ndarray
    mask: jnp.ndarray
    nobs: jnp.ndarray
    tvec: jnp.ndarray
    Cinv: jnp.ndarray
    mphi: jnp.ndarray
    Kinv: jnp.ndarray
    beta: jnp.ndarray


def make_likelihood_data(
    yobs: np.ndarray,
    gp_cov: GPCov,
    prior_temperature,
    dtype=None,
) -> LikelihoodData:
    """Precompute masks/fills. NaN observations are masked out, matching the
    reference's isfinite handling (likelihoods.jl:122-127)."""
    if dtype is None:
        dtype = gp_cov.Cinv_band.dtype
    yobs = np.asarray(yobs, dtype=np.float64)
    mask = np.isfinite(yobs)
    return LikelihoodData(
        yobs_filled=jnp.asarray(np.where(mask, yobs, 0.0), dtype=dtype),
        mask=jnp.asarray(mask.astype(np.float64), dtype=dtype),
        nobs=jnp.asarray(mask.sum(axis=0).astype(np.float64), dtype=dtype),
        tvec=gp_cov.tvec.astype(dtype),
        Cinv=gp_cov.Cinv_band.astype(dtype),
        mphi=gp_cov.mphi_band.astype(dtype),
        Kinv=gp_cov.Kinv_band.astype(dtype),
        beta=jnp.asarray(np.asarray(prior_temperature, dtype=np.float64), dtype=dtype),
    )


def log_posterior(
    x: jnp.ndarray,
    theta: jnp.ndarray,
    sigma: jnp.ndarray,
    data: LikelihoodData,
    ode_f: Callable,
) -> jnp.ndarray:
    """Scalar MAGI log-posterior (un-normalized) at (x, theta, sigma).

    x: (n, D) latent states; theta: (k,); sigma: (D,) observation noise SDs.
    """
    beta_deriv, beta_level, beta_obs = data.beta[0], data.beta[1], data.beta[2]
    sigma_sq = sigma * sigma

    # ODE right-hand side over the full grid in one traced call.
    f = ode_f(x, theta, data.tvec)  # (n, D)

    # Batched band matvecs: out[i, d] = sum_j A[d, i, j] v[j, d].
    mphi_x = jnp.einsum("dij,jd->id", data.mphi, x)
    e_deriv = f - mphi_x
    k_e = jnp.einsum("dij,jd->id", data.Kinv, e_deriv)
    c_x = jnp.einsum("dij,jd->id", data.Cinv, x)

    # Observation term (NaN-masked; -0.5 N_d log(2 pi sigma_d^2) only when
    # the dimension has observations — likelihoods.jl:139-143).
    resid = data.mask * (x - data.yobs_filled)
    sse = jnp.sum(resid * resid, axis=0)  # (D,)
    ll_obs = -0.5 * sse / sigma_sq - 0.5 * data.nobs * (
        LOG_2PI + jnp.log(sigma_sq)
    ) * (data.nobs > 0)

    ll_deriv = -0.5 * jnp.sum(e_deriv * k_e, axis=0)  # (D,)
    ll_level = -0.5 * jnp.sum(x * c_x, axis=0)  # (D,)

    return (
        jnp.sum(ll_obs) / beta_obs
        + jnp.sum(ll_deriv) / beta_deriv
        + jnp.sum(ll_level) / beta_level
    )


def log_likelihood_and_gradient_banded(
    x: jnp.ndarray,
    theta: jnp.ndarray,
    sigma: jnp.ndarray,
    yobs,
    gp_cov: GPCov,
    ode_f: Callable,
    prior_temperature=(1.0, 1.0, 1.0),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Parity API: value and flat gradient of length n*D + k + D.

    The gradient layout matches the reference exactly
    (likelihoods.jl:59-60,155-157): [vec(X) column-major; theta; sigma] with
    the sigma slot ALWAYS present (the sampling adapter truncates it when
    sigma is fixed). Gradient is exact autodiff of log_posterior.
    """
    data = make_likelihood_data(np.asarray(yobs), gp_cov, prior_temperature, dtype=x.dtype)

    def value(x_, theta_, sigma_):
        return log_posterior(x_, theta_, sigma_, data, ode_f)

    ll, grads = jax.value_and_grad(value, argnums=(0, 1, 2))(x, theta, sigma)
    gx, gt, gs = grads
    flat = jnp.concatenate([gx.T.reshape(-1), gt, gs])
    return ll, flat
