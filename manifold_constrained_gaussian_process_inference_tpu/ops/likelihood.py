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

# TPU matmul units compute f32 contractions in bfloat16 passes by default
# (relative error ~4e-3). The GP operators have entries ~1/dt^2 (up to
# ~1e3-1e4 on dense grids) feeding quadratic forms scaled by ~1/jitter, so
# default-precision einsums inject O(10) ENERGY noise into the sampler —
# measured as adapted step sizes collapsing to 1e-5-1e-7 on the TPU while
# the same f32 program on CPU (true-f32 matmuls) adapts healthily. Every
# likelihood contraction therefore requests full f32 precision; these ops
# are HBM-bound at sampling batch sizes, so the extra passes are ~free.
HIGHEST = jax.lax.Precision.HIGHEST


class LikelihoodData(NamedTuple):
    """Static device data for the likelihood (everything except x/theta/sigma).

    yobs_filled: (n, D) observations with NaN replaced by 0
    mask:        (n, D) 1.0 where the observation is finite, else 0.0
    nobs:        (D,)   number of finite observations per dimension
    tvec:        (n,)
    GKt:         (D, n, n) UPPER-banded transposed Cholesky factor of the
                 band-masked Kinv stack (Kinv_band = GK GK'); with GCt
                 (fused into mphi_gct, below) the quadratic forms are
                 computed as sums of squares ||GCt x||^2 / ||GKt e||^2 —
                 algebraically equal to x' Cinv_band x / e' Kinv_band e but
                 float32-stable on TPU (the inverse-based form loses ~1e-1
                 relative accuracy at Kinv scales ~1/jitter; measured on a
                 v5e).
    mphi_gct:    (2D, n, n) fused stack [mphi; GCt]: both consume the
                 centered state, so one batched einsum covers them (halves
                 the matvec kernel count on the hot path). The halves are
                 deliberately NOT stored as separate device arrays — the
                 unused duplicates would cost 2 D n^2 floats of HBM
                 residency (~160 MB at n=3169); host consumers
                 (make_centered_terms) slice this stack instead.
    beta:        (3,)   [beta_deriv, beta_level, beta_obs]
    """

    yobs_filled: jnp.ndarray
    mask: jnp.ndarray
    nobs: jnp.ndarray
    tvec: jnp.ndarray
    GKt: jnp.ndarray
    mphi_gct: jnp.ndarray
    beta: jnp.ndarray
    mu: jnp.ndarray      # (n, D) GP prior mean
    dotmu: jnp.ndarray   # (n, D) its time derivative


def _canonical_dtype(dtype):
    """Canonicalize through JAX: under a non-x64 process a float64 request
    (e.g. from f64 host GPCov bands) would otherwise emit a truncation
    UserWarning on every jnp.asarray (seen in the multichip-dryrun child
    processes). Maps f64 -> f32 silently there; identity under x64."""
    from jax import dtypes as _jdt

    return _jdt.canonicalize_dtype(np.dtype(dtype))


def _resolve_mean(mu, dotmu, n, d, dtype):
    """Broadcast user-provided GP means to (n, D); zeros by default
    (reference parity: GPCov.mu/dotmu are always zero,
    gaussian_process.jl:244-245)."""
    dtype = _canonical_dtype(dtype)
    if mu is None:
        mu_arr = np.zeros((n, d))
    else:
        mu_arr = np.asarray(mu, dtype=np.float64)
        if mu_arr.ndim == 1:
            mu_arr = np.broadcast_to(mu_arr, (n, d)).copy()
    if dotmu is None:
        dm_arr = np.zeros((n, d))
    else:
        dm_arr = np.asarray(dotmu, dtype=np.float64)
        if dm_arr.ndim == 1:
            dm_arr = np.broadcast_to(dm_arr, (n, d)).copy()
    return jnp.asarray(mu_arr, dtype=dtype), jnp.asarray(dm_arr, dtype=dtype)


def make_likelihood_data(
    yobs: np.ndarray,
    gp_cov: GPCov,
    prior_temperature,
    dtype=None,
    mu=None,
    dotmu=None,
) -> LikelihoodData:
    """Precompute masks/fills. NaN observations are masked out, matching the
    reference's isfinite handling (likelihoods.jl:122-127)."""
    if dtype is None:
        dtype = gp_cov.Cinv_band.dtype
    dtype = _canonical_dtype(dtype)
    yobs = np.asarray(yobs, dtype=np.float64)
    mask = np.isfinite(yobs)
    n, d = yobs.shape
    mu_j, dotmu_j = _resolve_mean(mu, dotmu, n, d, dtype)
    return LikelihoodData(
        yobs_filled=jnp.asarray(np.where(mask, yobs, 0.0), dtype=dtype),
        mask=jnp.asarray(mask.astype(np.float64), dtype=dtype),
        nobs=jnp.asarray(mask.sum(axis=0).astype(np.float64), dtype=dtype),
        tvec=gp_cov.tvec.astype(dtype),
        GKt=jnp.swapaxes(gp_cov.Kinv_band_chol, -1, -2).astype(dtype),
        mphi_gct=jnp.concatenate(
            [
                gp_cov.mphi_band.astype(dtype),
                jnp.swapaxes(gp_cov.Cinv_band_chol, -1, -2).astype(dtype),
            ],
            axis=0,
        ),
        beta=jnp.asarray(np.asarray(prior_temperature, dtype=np.float64), dtype=dtype),
        mu=mu_j,
        dotmu=dotmu_j,
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

    # Centered state: the GP prior applies to x - mu, and the conditional
    # derivative mean is dotmu + mphi (x - mu) (Documentation of Algorithm
    # section 2 with mean function; zeros reproduce reference behavior).
    xc = x - data.mu
    d_dims = x.shape[1]

    # Batched band matvecs: out[i, d] = sum_j A[d, i, j] v[j, d]. mphi and
    # GCt both act on xc — one fused (2D)-batched einsum.
    xc2 = jnp.concatenate([xc, xc], axis=1)  # (n, 2D)
    fused = jnp.einsum("dij,jd->id", data.mphi_gct, xc2, precision=HIGHEST)  # (n, 2D)
    mphi_x = fused[:, :d_dims]
    gc_x = fused[:, d_dims:]
    e_deriv = f - data.dotmu - mphi_x
    # Quadratic forms as sums of squares via the banded factors (see
    # LikelihoodData docstring): e' Kinv e = ||GKt e||^2, x' Cinv x = ||GCt x||^2.
    gk_e = jnp.einsum("dij,jd->id", data.GKt, e_deriv, precision=HIGHEST)

    # Observation term (NaN-masked; -0.5 N_d log(2 pi sigma_d^2) only when
    # the dimension has observations — likelihoods.jl:139-143).
    resid = data.mask * (x - data.yobs_filled)
    sse = jnp.sum(resid * resid, axis=0)  # (D,)
    ll_obs = -0.5 * sse / sigma_sq - 0.5 * data.nobs * (
        LOG_2PI + jnp.log(sigma_sq)
    ) * (data.nobs > 0)

    ll_deriv = -0.5 * jnp.sum(gk_e * gk_e, axis=0)  # (D,)
    ll_level = -0.5 * jnp.sum(gc_x * gc_x, axis=0)  # (D,)

    return (
        jnp.sum(ll_obs) / beta_obs
        + jnp.sum(ll_deriv) / beta_deriv
        + jnp.sum(ll_level) / beta_level
    )


class BandedLikelihoodData(NamedTuple):
    """Band-storage variant of LikelihoodData for large grids.

    The (D, n, n) stacks become (D, 2b+1, n) diagonal-extracted storage
    (ops/band.py) — O(n*b) HBM per evaluation instead of O(n^2). *_t fields
    hold the transposed operators' storage for the custom VJP.
    """

    yobs_filled: jnp.ndarray
    mask: jnp.ndarray
    nobs: jnp.ndarray
    tvec: jnp.ndarray
    mphi_bs: jnp.ndarray
    mphi_t_bs: jnp.ndarray
    GKt_bs: jnp.ndarray
    GK_bs: jnp.ndarray
    GCt_bs: jnp.ndarray
    GC_bs: jnp.ndarray
    beta: jnp.ndarray
    mu: jnp.ndarray
    dotmu: jnp.ndarray


def make_banded_likelihood_data(
    yobs: np.ndarray,
    gp_cov: GPCov,
    prior_temperature,
    dtype=None,
    mu=None,
    dotmu=None,
) -> BandedLikelihoodData:
    from .band import dense_to_band_storage
    from .pallas_band import transpose_band_storage

    if dtype is None:
        dtype = gp_cov.Cinv_band.dtype
    dtype = _canonical_dtype(dtype)
    yobs = np.asarray(yobs, dtype=np.float64)
    mask = np.isfinite(yobs)
    b = gp_cov.bandsize

    def storage(stack):
        arr = np.asarray(stack, dtype=np.float64)
        return np.stack([dense_to_band_storage(a, b) for a in arr])

    def storage_t(bs):
        return np.stack([transpose_band_storage(a, b) for a in bs])

    mphi_bs = storage(gp_cov.mphi_band)
    gk_bs = storage(gp_cov.Kinv_band_chol)       # lower factor GK
    gc_bs = storage(gp_cov.Cinv_band_chol)
    gkt_bs = storage_t(gk_bs)                    # GK^T (upper)
    gct_bs = storage_t(gc_bs)

    n, d = yobs.shape
    mu_j, dotmu_j = _resolve_mean(mu, dotmu, n, d, dtype)
    j = lambda a: jnp.asarray(a, dtype=dtype)
    return BandedLikelihoodData(
        yobs_filled=j(np.where(mask, yobs, 0.0)),
        mask=j(mask.astype(np.float64)),
        nobs=j(mask.sum(axis=0).astype(np.float64)),
        tvec=gp_cov.tvec.astype(dtype),
        mphi_bs=j(mphi_bs),
        mphi_t_bs=j(storage_t(mphi_bs)),
        GKt_bs=j(gkt_bs),
        GK_bs=j(gk_bs),
        GCt_bs=j(gct_bs),
        GC_bs=j(gc_bs),
        beta=j(np.asarray(prior_temperature, dtype=np.float64)),
        mu=mu_j,
        dotmu=dotmu_j,
    )


def log_posterior_banded(
    x: jnp.ndarray,
    theta: jnp.ndarray,
    sigma: jnp.ndarray,
    data: BandedLikelihoodData,
    ode_f: Callable,
    bandwidth: int,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """log_posterior computed through band-storage matvecs (same math as
    log_posterior; O(n*b) memory traffic; Pallas kernel on TPU)."""
    from .pallas_band import band_matvec

    beta_deriv, beta_level, beta_obs = data.beta[0], data.beta[1], data.beta[2]
    sigma_sq = sigma * sigma
    f = ode_f(x, theta, data.tvec)  # (n, D)

    xct = (x - data.mu).T  # (D, n) centered
    mphi_x = band_matvec(data.mphi_bs, data.mphi_t_bs, xct, bandwidth, use_pallas)
    e_deriv = (f - data.dotmu).T - mphi_x
    gk_e = band_matvec(data.GKt_bs, data.GK_bs, e_deriv, bandwidth, use_pallas)
    gc_x = band_matvec(data.GCt_bs, data.GC_bs, xct, bandwidth, use_pallas)

    resid = data.mask * (x - data.yobs_filled)
    sse = jnp.sum(resid * resid, axis=0)
    ll_obs = -0.5 * sse / sigma_sq - 0.5 * data.nobs * (
        LOG_2PI + jnp.log(sigma_sq)
    ) * (data.nobs > 0)
    ll_deriv = -0.5 * jnp.sum(gk_e * gk_e, axis=1)
    ll_level = -0.5 * jnp.sum(gc_x * gc_x, axis=1)

    return (
        jnp.sum(ll_obs) / beta_obs
        + jnp.sum(ll_deriv) / beta_deriv
        + jnp.sum(ll_level) / beta_level
    )


class CenteredTerms(NamedTuple):
    """Host-precomputed constants for the mode-centered evaluation.

    Float32 kills raw whitened NUTS on dense grids: mphi is a
    differentiation operator (entries ~1/dt^2, up to ~1e3 on the FN
    filllevel grids), so mphi @ x on an O(1) state carries ~|mphi|*eps_f32
    ~ 1e-4 absolute cancellation noise, which GKt (scale ~ sqrt(1/jitter))
    amplifies into O(1) ENERGY noise — dual averaging then drives the step
    size to ~1e-5 chasing phantom rejections (measured: CPU f64 n=397
    adapts eps 5.7e-2; TPU f32 same workload adapts 1e-5 - 1e-7).

    Centering fixes the arithmetic, not the math: with dx = x - x_ref and
    the x_ref parts precomputed in float64 FROM THE SAME (upcast f32)
    operators, every on-device product sees only the small dx, so the
    noise scales with |dx| ~ posterior width instead of |x| ~ 1. All
    fields are (n, D) in the data dtype.
    """

    x_ref: jnp.ndarray   # the centering state (whitener center's x block)
    r_ref: jnp.ndarray   # x_ref - yobs_filled
    c_e: jnp.ndarray     # dotmu + mphi (x_ref - mu)
    c_gc: jnp.ndarray    # GCt (x_ref - mu)


def _band_storage_matvec_np(bs: np.ndarray, x: np.ndarray, b: int) -> np.ndarray:
    """Float64 host evaluation of the band-storage matvec (ops/band.py
    semantics): out[i] = sum_k bs[b+k, i+k] * x[i+k]."""
    n = x.shape[0]
    out = np.zeros(n)
    for k in range(-b, b + 1):
        lo, hi = max(0, -k), min(n, n - k)
        out[lo:hi] += bs[b + k, lo + k : hi + k] * x[lo + k : hi + k]
    return out


def make_centered_terms(data, x_ref, bandwidth: int = 0) -> CenteredTerms:
    """Precompute the x_ref-dependent constants in float64 on the host,
    from the data's OWN (upcast) operators — the result is the exact
    infinite-precision evaluation of the stored f32 operators, so the
    centered value is the same function of Psi as the uncentered one."""
    xr = np.asarray(x_ref, dtype=np.float64)
    mu = np.asarray(data.mu, dtype=np.float64)
    dotmu = np.asarray(data.dotmu, dtype=np.float64)
    xc = xr - mu
    if isinstance(data, BandedLikelihoodData):
        b = bandwidth
        d = xr.shape[1]
        mphi64 = np.asarray(data.mphi_bs, dtype=np.float64)
        gct64 = np.asarray(data.GCt_bs, dtype=np.float64)
        c_mphi = np.stack(
            [_band_storage_matvec_np(mphi64[p], xc[:, p], b) for p in range(d)],
            axis=-1,
        )
        c_gc = np.stack(
            [_band_storage_matvec_np(gct64[p], xc[:, p], b) for p in range(d)],
            axis=-1,
        )
    else:
        d = xr.shape[1]
        stack64 = np.asarray(data.mphi_gct, dtype=np.float64)
        mphi64, gct64 = stack64[:d], stack64[d:]
        c_mphi = np.einsum("dij,jd->id", mphi64, xc)
        c_gc = np.einsum("dij,jd->id", gct64, xc)
    dtype = data.mask.dtype
    j = lambda a: jnp.asarray(a, dtype=dtype)
    return CenteredTerms(
        x_ref=j(xr),
        r_ref=j(xr - np.asarray(data.yobs_filled, dtype=np.float64)),
        c_e=j(dotmu + c_mphi),
        c_gc=j(c_gc),
    )


def log_posterior_centered(
    dx: jnp.ndarray,
    theta: jnp.ndarray,
    sigma: jnp.ndarray,
    data,
    cent: CenteredTerms,
    ode_f: Callable,
    bandwidth: int = 0,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """log_posterior evaluated mode-centered: identical math to
    log_posterior / log_posterior_banded at x = x_ref + dx, but every
    on-device operator product consumes only dx (see CenteredTerms)."""
    beta_deriv, beta_level, beta_obs = data.beta[0], data.beta[1], data.beta[2]
    sigma_sq = sigma * sigma
    d_dims = dx.shape[1]

    f = ode_f(cent.x_ref + dx, theta, data.tvec)  # (n, D)

    if isinstance(data, BandedLikelihoodData):
        from .pallas_band import band_matvec

        dxt = dx.T  # (D, n)
        mphi_dx = band_matvec(
            data.mphi_bs, data.mphi_t_bs, dxt, bandwidth, use_pallas
        )
        e = (f - cent.c_e).T - mphi_dx                   # (D, n)
        gk_e = band_matvec(data.GKt_bs, data.GK_bs, e, bandwidth, use_pallas)
        gct_dx = band_matvec(
            data.GCt_bs, data.GC_bs, dxt, bandwidth, use_pallas
        )
        gc = cent.c_gc.T + gct_dx
        ll_deriv = -0.5 * jnp.sum(gk_e * gk_e, axis=1)
        ll_level = -0.5 * jnp.sum(gc * gc, axis=1)
    else:
        dx2 = jnp.concatenate([dx, dx], axis=1)          # (n, 2D)
        fused = jnp.einsum("dij,jd->id", data.mphi_gct, dx2, precision=HIGHEST)
        mphi_dx = fused[:, :d_dims]
        gct_dx = fused[:, d_dims:]
        e = f - cent.c_e - mphi_dx
        gk_e = jnp.einsum("dij,jd->id", data.GKt, e, precision=HIGHEST)
        gc = cent.c_gc + gct_dx
        ll_deriv = -0.5 * jnp.sum(gk_e * gk_e, axis=0)
        ll_level = -0.5 * jnp.sum(gc * gc, axis=0)

    resid = data.mask * (dx + cent.r_ref)
    sse = jnp.sum(resid * resid, axis=0)
    ll_obs = -0.5 * sse / sigma_sq - 0.5 * data.nobs * (
        LOG_2PI + jnp.log(sigma_sq)
    ) * (data.nobs > 0)

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
