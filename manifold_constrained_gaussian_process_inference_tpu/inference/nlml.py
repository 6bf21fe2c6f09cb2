"""GP hyperparameter initialization: jit'd negative log marginal likelihood,
optimized with L-BFGS and vmapped over state dimensions.

Counterpart of the reference's per-dimension Nelder-Mead NLML optimization
(/root/reference/src/initialization.jl:72-252). Same objective —

  NLML = 0.5 * ( log|K + sigma^2 I| + y^T (K + sigma^2 I)^{-1} y + N log 2pi )

over log-parameters [log variance, log lengthscale, log sigma] — but the
optimizer is gradient-based (autodiff through the Cholesky) and all D
dimensions run batched in one jit region instead of a Python loop.

NaN observations are handled with the masked-covariance identity instead of
data-dependent shapes: with M = diag(mask),
  K_eff = M K M + (I - M)  and  y_eff = M y
gives log|K_eff| = log|K_subset| and y_eff^T K_eff^{-1} y_eff =
y_subset^T K_subset^{-1} y_subset, exactly — static shapes, jit-safe
(the reference subsets the arrays instead, initialization.jl:91-99).

Failure semantics mirror the reference: non-PD covariances get an Inf-like
penalty (initialization.jl:163-175); invalid optimized parameters fall back
to the initial guess (initialization.jl:242-248).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import kernels as K

_BIG = 1e10
_LOG_PARAM_CLIP = 12.0


def negative_log_marginal_likelihood(
    log_params: jnp.ndarray,
    y_filled: jnp.ndarray,
    mask: jnp.ndarray,
    tvec: jnp.ndarray,
    kernel_type: str,
    jitter: float = 1e-6,
) -> jnp.ndarray:
    """NLML for one dimension. ``y_filled`` has NaNs replaced by 0, ``mask``
    is 1.0 at finite observations."""
    lp = jnp.clip(log_params, -_LOG_PARAM_CLIP, _LOG_PARAM_CLIP)
    variance = jnp.exp(lp[0])
    lengthscale = jnp.exp(lp[1])
    sigma_sq = jnp.exp(2.0 * lp[2])
    n = tvec.shape[0]
    n_valid = jnp.sum(mask)

    kmat = K.kernel_matrix(kernel_type, tvec, variance, lengthscale)
    k_full = kmat + (sigma_sq + jitter) * jnp.eye(n, dtype=kmat.dtype)
    m_outer = mask[:, None] * mask[None, :]
    k_eff = m_outer * k_full + jnp.diag(1.0 - mask)

    # Robust Cholesky under jit: probe, then re-factor a safe matrix so the
    # gradient of the rejected branch stays finite (double-where pattern).
    chol_probe = jnp.linalg.cholesky(k_eff)
    ok = jnp.all(jnp.isfinite(chol_probe))
    k_safe = jnp.where(ok, k_eff, jnp.eye(n, dtype=k_eff.dtype))
    chol = jnp.linalg.cholesky(k_safe)

    y = y_filled * mask
    alpha = jax.scipy.linalg.cho_solve((chol, True), y)
    quad = jnp.dot(y, alpha)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
    nll = 0.5 * (logdet + quad + n_valid * jnp.log(2.0 * jnp.pi))
    nll = jnp.where(jnp.isfinite(nll), nll, _BIG)
    return jnp.where(ok & (n_valid > 0), nll, _BIG)


def _lbfgs_minimize(
    fun, x0: jnp.ndarray, max_iters: int, ftol: float = 1e-8,
    gtol: float = 1e-8,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """L-BFGS via optax (jittable, vmappable) with convergence-tolerance
    early stopping inside the fixed-length scan: once the relative
    objective change drops below ``ftol`` or the gradient inf-norm below
    ``gtol`` (Optim.jl ``f_tol``/``g_tol`` semantics — the reference's
    gpOptimFTol/gpOptimGTol knobs, /root/reference/src/MagiJl.jl:266-271,
    both defaulting to 1e-8), the carry freezes and remaining iterations
    are no-ops (jit-safe early stop: same program, zero further progress
    cost beyond the cheap frozen steps).

    Returns (best_params, best_value, value_trace, iters_used).
    """
    import optax

    opt = optax.lbfgs()
    vg = jax.value_and_grad(fun)
    ftol = jnp.asarray(ftol, x0.dtype)
    gtol = jnp.asarray(gtol, x0.dtype)

    def step(carry, _):
        params, state, best_p, best_v, prev_v, done = carry
        value, grad = vg(params)
        better = (~done) & (value < best_v)
        best_p = jnp.where(better, params, best_p)
        best_v = jnp.where(better, value, best_v)
        conv_f = jnp.abs(value - prev_v) <= ftol * (jnp.abs(value) + 1e-30)
        conv_g = jnp.max(jnp.abs(grad)) <= gtol
        done = done | conv_f | conv_g
        updates, new_state = opt.update(
            grad, state, params, value=value, grad=grad, value_fn=fun
        )
        new_params = optax.apply_updates(params, updates)
        # Guard against NaN steps poisoning the trajectory.
        new_params = jnp.where(
            jnp.all(jnp.isfinite(new_params)), new_params, best_p
        )
        params = jnp.where(done, params, new_params)
        state = jax.tree_util.tree_map(
            lambda old, new: jnp.where(done, old, new), state, new_state
        )
        return (params, state, best_p, best_v, value, done), (value, done)

    v0 = fun(x0)
    carry0 = (x0, opt.init(x0), x0, v0, jnp.asarray(jnp.inf, v0.dtype),
              jnp.asarray(False))
    (params, _, best_p, best_v, _, _), (trace, dones) = jax.lax.scan(
        step, carry0, None, length=max_iters
    )
    iters_used = jnp.sum(~dones)
    final_v = fun(params)
    better = final_v < best_v
    return (
        jnp.where(better, params, best_p),
        jnp.where(better, final_v, best_v),
        trace,
        iters_used,
    )


@partial(jax.jit, static_argnames=("kernel_type", "max_iters"))
def _optimize_all_dims(
    initial_log_params: jnp.ndarray,  # (D, 3)
    y_filled: jnp.ndarray,            # (n, D)
    mask: jnp.ndarray,                # (n, D)
    tvec: jnp.ndarray,                # (n,)
    kernel_type: str,
    jitter: float,
    max_iters: int,
    ftol: float = 1e-8,
    gtol: float = 1e-8,
):
    def one_dim(lp0, y_d, m_d):
        fun = lambda lp: negative_log_marginal_likelihood(
            lp, y_d, m_d, tvec, kernel_type, jitter
        )
        return _lbfgs_minimize(fun, lp0, max_iters, ftol=ftol, gtol=gtol)

    return jax.vmap(one_dim)(initial_log_params, y_filled.T, mask.T)


def default_initial_guesses(y_obs: np.ndarray, t_obs: np.ndarray) -> np.ndarray:
    """Data-driven initial guesses per dimension (D, 3) in log scale:
    [log var(y), log(time_range/10), log(1.4826 * MAD)].

    Parity: /root/reference/src/MagiJl.jl:279-293.
    """
    y_obs = np.asarray(y_obs, dtype=np.float64)
    t_obs = np.asarray(t_obs, dtype=np.float64)
    n, d = y_obs.shape
    time_range = float(t_obs.max() - t_obs.min())
    out = np.zeros((d, 3))
    for dim in range(d):
        valid = y_obs[:, dim][np.isfinite(y_obs[:, dim])]
        if valid.size > 1:
            var_y = float(np.var(valid, ddof=1))
            data_range = float(valid.max() - valid.min())
            mad = float(np.median(np.abs(valid - np.median(valid))) * 1.4826)
            out[dim, 0] = np.log(max(var_y, 1e-4))
            out[dim, 1] = np.log(max(time_range / 10.0, 1e-2))
            out[dim, 2] = np.log(max(mad, 1e-3 * data_range, 1e-4))
        else:
            out[dim, 0] = 0.0
            out[dim, 1] = np.log(max(time_range / 10.0, 1e-2))
            out[dim, 2] = np.log(0.1)
    return out


def optimize_gp_hyperparameters(
    y_obs: np.ndarray,
    t_obs: np.ndarray,
    kernel_type: str,
    initial_log_params: np.ndarray | None = None,
    jitter: float = 1e-6,
    max_iters: int = 100,
    dtype=None,
    ftol: float = 1e-8,
    gtol: float = 1e-8,
    show_trace: bool = False,
) -> np.ndarray:
    """Optimize (variance, lengthscale, sigma) for every dimension at once.

    Returns (D, 3) in ORIGINAL scale. Falls back to exp(initial guess) for
    any dimension whose optimum is non-finite/non-positive (parity:
    initialization.jl:242-248).

    ``ftol``/``gtol``/``show_trace`` mirror the reference's gpOptimFTol /
    gpOptimGTol / gpOptimShowTrace (/root/reference/src/MagiJl.jl:266-271;
    Optim.jl semantics: relative objective change / gradient inf-norm).
    ``show_trace`` logs the per-iteration NLML values (up to the stopping
    point) for every dimension at INFO level.
    """
    if dtype is None:
        from ..config import default_dtype

        dtype = default_dtype()
    y_obs = np.asarray(y_obs, dtype=np.float64)
    t_obs = np.asarray(t_obs, dtype=np.float64)
    if initial_log_params is None:
        initial_log_params = default_initial_guesses(y_obs, t_obs)
    initial_log_params = np.asarray(initial_log_params, dtype=np.float64)

    mask = np.isfinite(y_obs)
    y_filled = np.where(mask, y_obs, 0.0)

    best_lp, best_v, trace, iters_used = _optimize_all_dims(
        jnp.asarray(initial_log_params, dtype),
        jnp.asarray(y_filled, dtype),
        jnp.asarray(mask.astype(np.float64), dtype),
        jnp.asarray(t_obs, dtype),
        kernel_type,
        float(jitter),
        int(max_iters),
        float(ftol),
        float(gtol),
    )
    if show_trace:
        import logging

        logger = logging.getLogger(__name__)
        trace_np = np.asarray(trace, dtype=np.float64)
        used_np = np.asarray(iters_used)
        for dim in range(trace_np.shape[0]):
            used = int(used_np[dim])
            logger.info(
                "NLML dim %d: %d/%d iterations (ftol=%.1e gtol=%.1e); "
                "trace: %s",
                dim, used, int(max_iters), ftol, gtol,
                np.array2string(
                    trace_np[dim, : max(used, 1)], precision=6,
                    threshold=20, edgeitems=5,
                ),
            )
    best_lp = np.asarray(best_lp, dtype=np.float64)
    best_v = np.asarray(best_v, dtype=np.float64)
    result = np.exp(best_lp)

    fallback = np.exp(initial_log_params)
    bad = (
        ~np.isfinite(result).all(axis=1)
        | (result <= 0).any(axis=1)
        | ~np.isfinite(best_v)
        | (best_v >= _BIG * 0.5)
    )
    result[bad] = fallback[bad]
    return result
