"""Laplace whitening of the full sampled vector Psi.

The MAGI posterior's curvature is wildly anisotropic: the latent-x block
inherits the GP precision scales (~1e6-1e8 — Kinv ~ 1/jitter), theta
posteriors have sd ~1e-2, and the ODE Jacobian couples x across state
dimensions and to theta. A diagonal HMC metric cannot fix this; measured on
the FN n=397 workload raw-space NUTS saturates max tree depth (1023
leapfrogs/iteration) and mixes at ESS ~ 1e-2 per iteration.

Fix: sample zeta with  Psi = center + W zeta,  W = L^{-T},  P = L L^T,
where P is the GAUSS-NEWTON approximation of the posterior precision at the
(MAP-warmed) center, over the whole Psi = [vec(X); theta(z); log sigma]:

  P_xx      = blockdiag_d(Cinv_d)/b_lvl + B' Kblk B /b_drv + diag(mask)/(s0^2 b_obs)
  P_x,theta = B' Kblk B_th / b_drv
  P_th,th   = B_th' Kblk B_th / b_drv  (+ relative ridge)
  P_ss      = diag(2 nobs / b_obs + 1)          (log-sigma curvature scale)

with B = J0 - M (pointwise ODE Jacobian minus block-diag mphi) and B_th the
theta-Jacobian, both evaluated at the center and chain-ruled through the
bounded theta transform when active. The map is linear and FIXED, so the
posterior is exactly preserved (constant Jacobian); it simply hands the
sampler a ~unit-curvature space. One extra (dim x dim) matvec per
log-posterior evaluation — MXU-friendly.

No reference analogue: MagiJl samples raw Psi, a primary reason published
MAGI runs need 20k-100k NUTS iterations.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class PsiWhitener(NamedTuple):
    W: jnp.ndarray        # (dim, dim): psi = center + W zeta
    L_T: jnp.ndarray      # (dim, dim): zeta = L^T (psi - center)
    center: jnp.ndarray   # (dim,)


def _theta_dz(theta_transform, z_theta: np.ndarray) -> np.ndarray:
    """d theta / d z at z_theta for the bounded reparameterization."""
    if theta_transform is None:
        return np.ones_like(z_theta)
    out = np.ones_like(z_theta)
    for i, kind in enumerate(theta_transform.kind):
        if kind == 1 or kind == 2:
            out[i] = np.exp(z_theta[i])  # |d theta/dz|; sign irrelevant in GN
        elif kind == 3:
            w = theta_transform.ub[i] - theta_transform.lb[i]
            s = 1.0 / (1.0 + np.exp(-z_theta[i]))
            out[i] = w * s * (1.0 - s)
    return out


def build_precision(
    gp_cov,
    yobs: np.ndarray,
    target,
    psi_center: np.ndarray,
    prior_temperature,
) -> np.ndarray:
    """Gauss-Newton precision of the log-posterior at psi_center (float64,
    host). ``target`` supplies the system, transforms, and layout."""
    beta = np.asarray(prior_temperature, dtype=np.float64)
    mask = np.isfinite(np.asarray(yobs))
    n, d = mask.shape
    nd = n * d
    k = target.n_params_ode
    dim = psi_center.shape[0]
    psi_center = np.asarray(psi_center, dtype=np.float64)

    cinv = np.asarray(gp_cov.Cinv_band, dtype=np.float64)
    kinv = np.asarray(gp_cov.Kinv_band, dtype=np.float64)
    mphi = np.asarray(gp_cov.mphi_band, dtype=np.float64)
    tvec = np.asarray(gp_cov.tvec, dtype=np.float64)

    # Unpack the center on the CONSTRAINED scale for Jacobian evaluation.
    x_c = psi_center[:nd].reshape(d, n).T
    z_theta = psi_center[nd : nd + k]
    if target.theta_transform is not None:
        from .transforms import constrain_np

        theta_c = constrain_np(target.theta_transform, z_theta)
    else:
        theta_c = z_theta
    if target.sigma_is_fixed:
        sigma_c = np.asarray(target.sigma_init, dtype=np.float64)
    else:
        sigma_c = np.exp(np.clip(psi_center[nd + k :], -15, 15))

    import jax

    j0 = np.asarray(
        target.system.f_dx(
            jnp.asarray(x_c), jnp.asarray(theta_c), jnp.asarray(tvec)
        ),
        dtype=np.float64,
    )  # (n, D, D)
    jth = np.asarray(
        target.system.f_dtheta(
            jnp.asarray(x_c), jnp.asarray(theta_c), jnp.asarray(tvec)
        ),
        dtype=np.float64,
    )  # (n, D, k)
    jth = jth * _theta_dz(target.theta_transform, z_theta)[None, None, :]

    # B (nd, nd): block (p, j) = diag(j0[:, p, j]) - delta_pj mphi_p
    b = np.zeros((nd, nd))
    for p in range(d):
        b[p * n : (p + 1) * n, p * n : (p + 1) * n] = -mphi[p]
        for j in range(d):
            blk = b[p * n : (p + 1) * n, j * n : (j + 1) * n]
            blk[np.arange(n), np.arange(n)] += j0[:, p, j]
    # B_th (nd, k): rows (p, i)
    b_th = np.concatenate([jth[:, p, :] for p in range(d)], axis=0)

    kb = np.zeros((nd, nd))
    prec = np.zeros((dim, dim))
    for p in range(d):
        sl = slice(p * n, (p + 1) * n)
        kb[sl, sl] = kinv[p]
        prec[sl, sl] += cinv[p] / beta[1]
    kbb = kb @ b
    prec[:nd, :nd] += b.T @ kbb / beta[0]
    prec[np.arange(nd), np.arange(nd)] += (
        mask.T.reshape(-1) / np.repeat(sigma_c**2, n) / beta[2]
    )
    cross = kbb.T @ b_th / beta[0]  # (nd, k)  == B' Kblk B_th / b
    prec[:nd, nd : nd + k] += cross
    prec[nd : nd + k, :nd] += cross.T
    ptt = b_th.T @ kb @ b_th / beta[0]
    prec[nd : nd + k, nd : nd + k] += ptt
    if not target.sigma_is_fixed:
        nobs = mask.sum(axis=0).astype(np.float64)
        prec[nd + k :, nd + k :] = np.diag(2.0 * nobs / beta[2] + 1.0)

    # Weak unit-scale addition on the theta block: flat theta directions
    # (no GN curvature) get z-scale 1 instead of exploding, while
    # well-determined directions (curvature >> 1) are unaffected. The x
    # block always has the GP part; the sigma block already carries +1.
    prec[range(nd, nd + k), range(nd, nd + k)] += 1.0
    return 0.5 * (prec + prec.T)


def _robust_chol(prec: np.ndarray) -> np.ndarray:
    dim = prec.shape[0]
    scale = float(np.max(np.diag(prec)))
    chol = None
    for trial in range(12):
        try:
            chol = np.linalg.cholesky(
                prec
                + (0.0 if trial == 0 else scale * 10.0 ** (trial - 14)) * np.eye(dim)
            )
            break
        except np.linalg.LinAlgError:
            continue
    if chol is None:
        wv, vec = np.linalg.eigh(prec)
        wv = np.maximum(wv, scale * 1e-12)
        chol = np.linalg.cholesky((vec * wv) @ vec.T)
    return chol


def build_psi_whitener(
    gp_cov,
    yobs: np.ndarray,
    target,
    psi_center: np.ndarray,
    prior_temperature,
    dtype,
) -> PsiWhitener:
    """Whitener from the Gauss-Newton precision at psi_center."""
    psi_center = np.asarray(psi_center, dtype=np.float64)
    prec = build_precision(gp_cov, yobs, target, psi_center, prior_temperature)
    chol = _robust_chol(prec)
    w = np.linalg.inv(chol).T  # L^{-T}
    return PsiWhitener(
        W=jnp.asarray(w, dtype=dtype),
        L_T=jnp.asarray(chol.T, dtype=dtype),
        center=jnp.asarray(psi_center, dtype=dtype),
    )


def gauss_newton_map(
    vg,
    gp_cov,
    yobs,
    target,
    psi0: np.ndarray,
    prior_temperature,
    n_newton: int = 200,
    tol: float = 1e-4,
    freeze: "slice | np.ndarray | None" = None,
    min_improvement: float = 0.05,
    warn_on_cap: bool = True,
):
    """MAP optimization by damped Gauss-Newton: step = P(psi)^{-1} grad with
    backtracking line search. The GN precision is exactly the curvature the
    whitener uses, so a handful of iterations reach the mode where
    first-order methods stall across the ~6 orders of magnitude of MAGI
    curvature (measured: Adam plateaus at lp ~ -2.5e4 where Newton reaches
    the mode at lp ~ -1e2). Host loop; called once at setup."""
    import logging

    logger = logging.getLogger(__name__)
    psi = np.asarray(psi0, dtype=np.float64)
    v, g = vg(jnp.asarray(psi))
    v = float(v)
    v_start = v
    lam = 0.0  # Levenberg damping (relative to the precision's diag scale)
    it = -1
    for it in range(n_newton):
        prec = build_precision(gp_cov, yobs, target, psi, prior_temperature)
        diag_scale = float(np.median(np.diag(prec)))
        g_np = np.asarray(g, dtype=np.float64)
        if freeze is not None:
            # Keep frozen coordinates at their init (slice or boolean
            # mask): log sigma (the sigma-inflated degenerate mode
            # otherwise captures the Newton flow) or everything-but-theta
            # (the theta-only pre-stage in solve.py).
            g_np = g_np.copy()
            g_np[freeze] = 0.0

        # Levenberg-Marquardt: far from the mode the pure GN step can be so
        # large that no backtracking fraction improves (measured at n=397);
        # damping (P + lam*s*I) shortens and bends the step toward the
        # gradient until it succeeds, then relaxes.
        improved = False
        for _lm in range(12):
            damped = prec
            if lam > 0:
                damped = prec + lam * diag_scale * np.eye(prec.shape[0])
            chol = _robust_chol(damped)
            step = _cho_solve(chol, g_np)
            if freeze is not None:
                step = step.copy()
                step[freeze] = 0.0
            alpha = 1.0
            for _ in range(20):
                cand = psi + alpha * step
                v_new, g_new = vg(jnp.asarray(cand))
                v_new = float(v_new)
                if np.isfinite(v_new) and v_new > v:
                    gain = v_new - v
                    psi, v, g = cand, v_new, g_new
                    improved = True
                    break
                alpha *= 0.5
            if improved:
                if alpha == 1.0:
                    lam = lam / 3.0 if lam > 1e-9 else 0.0
                elif alpha < 0.25:
                    lam = max(lam * 4.0, 1e-6)
                break
            lam = max(lam * 10.0, 1e-6)
        if not improved:
            break
        # Converged: full undamped step accepted with negligible gain, or
        # an undamped accepted step is tiny. (Damped iterations take small
        # steps by construction — they must not trigger the stop.)
        if lam == 0.0 and alpha == 1.0 and gain < min_improvement:
            break
        if lam == 0.0 and np.linalg.norm(alpha * step) < tol * (
            1.0 + np.linalg.norm(psi)
        ):
            break
    logger.info(
        "Gauss-Newton MAP: log-posterior %.4g -> %.4g (%d iterations)",
        v_start, v, it + 1,
    )
    if it + 1 >= n_newton and warn_on_cap:
        logger.warning(
            "Gauss-Newton MAP hit the iteration cap before converging "
            "(final lp %.4g); the whitener will be built off-mode. Strongly "
            "tempered observations (beta_obs > 1) make this landscape very "
            "nonlinear — consider default prior temperatures, fixed sigma, "
            "or a larger n_newton.", v,
        )
    return psi


def _cho_solve(chol: np.ndarray, rhs: np.ndarray) -> np.ndarray:
    try:
        from scipy.linalg import cho_solve as _scipy_cho_solve

        return _scipy_cho_solve((chol, True), rhs)
    except ImportError:
        y = np.linalg.solve(chol, rhs)
        return np.linalg.solve(chol.T, y)



def wrap_value_and_grad(vg, whitener: PsiWhitener):
    """vg over psi -> vg over zeta (psi = center + W zeta). Gradient by the
    chain rule: g_zeta = W' g_psi (one extra matvec each way)."""

    def vg_zeta(zeta):
        psi = whitener.center + whitener.W @ zeta
        value, g_psi = vg(psi)
        return value, whitener.W.T @ g_psi

    return vg_zeta


def zeta_to_psi_np(whitener: PsiWhitener, zeta: np.ndarray) -> np.ndarray:
    """Batched host-side back-transform: (..., dim) zeta -> psi."""
    w = np.asarray(whitener.W, dtype=np.float64)
    c = np.asarray(whitener.center, dtype=np.float64)
    return np.asarray(zeta, dtype=np.float64) @ w.T + c


def psi_to_zeta_np(whitener: PsiWhitener, psi: np.ndarray) -> np.ndarray:
    lt = np.asarray(whitener.L_T, dtype=np.float64)
    c = np.asarray(whitener.center, dtype=np.float64)
    return (np.asarray(psi, dtype=np.float64) - c) @ lt.T
