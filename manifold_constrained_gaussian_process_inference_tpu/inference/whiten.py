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


def make_precision_cache(gp_cov, yobs, target, prior_temperature) -> dict:
    """psi-independent pieces of the GN precision. Building these once per
    GN stage turns the per-iteration assembly from O((nD)^3) dense BLAS
    (the old kb @ b / b' kbb products — ~8 GFLOP at n=793, the dominant
    cost of the whole MAP stage) into O((nD)^2) elementwise work: the
    pointwise ODE Jacobian J only ever enters as diagonal blocks, so
    J'KJ / J'KM / M'KJ are row/column scalings of the constant banded
    matrices, and M'KM is constant."""
    beta = np.asarray(prior_temperature, dtype=np.float64)
    mask = np.isfinite(np.asarray(yobs))
    n, d = mask.shape
    cinv = np.asarray(gp_cov.Cinv_band, dtype=np.float64)
    kinv = np.asarray(gp_cov.Kinv_band, dtype=np.float64)
    mphi = np.asarray(gp_cov.mphi_band, dtype=np.float64)
    km = np.stack([kinv[p] @ mphi[p] for p in range(d)])      # K M blocks
    mkm = np.stack([mphi[p].T @ km[p] for p in range(d)])     # M'K M blocks
    return dict(
        beta=beta, mask=mask, n=n, d=d, k=target.n_params_ode,
        cinv=cinv, kinv=kinv, mphi=mphi, km=km, mkm=mkm,
        tvec=np.asarray(gp_cov.tvec, dtype=np.float64),
        nobs=mask.sum(axis=0).astype(np.float64),
        bandsize=int(getattr(gp_cov, "bandsize", n - 1)),
    )


def build_precision(
    gp_cov,
    yobs: np.ndarray,
    target,
    psi_center: np.ndarray,
    prior_temperature,
    cache: dict = None,
) -> np.ndarray:
    """Gauss-Newton precision of the log-posterior at psi_center (float64,
    host). ``target`` supplies the system, transforms, and layout.

    With B = J - M (pointwise ODE Jacobian minus blockdiag mphi) the x
    block is  B'KB = J'KJ - J'KM - M'KJ + M'KM;  J's blocks are diagonal,
    so every J-product is an elementwise row/column scaling of the cached
    banded matrices — no (nD)^3 products anywhere."""
    if cache is None:
        cache = make_precision_cache(gp_cov, yobs, target, prior_temperature)
    beta, mask = cache["beta"], cache["mask"]
    n, d, k = cache["n"], cache["d"], cache["k"]
    kinv, cinv = cache["kinv"], cache["cinv"]
    mphi, km, mkm = cache["mphi"], cache["km"], cache["mkm"]
    nd = n * d
    dim = psi_center.shape[0]
    psi_center = np.asarray(psi_center, dtype=np.float64)

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

    tvec = cache["tvec"]
    j0 = np.asarray(
        target.system.f_dx(
            jnp.asarray(x_c), jnp.asarray(theta_c), jnp.asarray(tvec)
        ),
        dtype=np.float64,
    )  # (n, D, D): j0[i, q, p] = df_q/dx_p at t_i
    jth = np.asarray(
        target.system.f_dtheta(
            jnp.asarray(x_c), jnp.asarray(theta_c), jnp.asarray(tvec)
        ),
        dtype=np.float64,
    )  # (n, D, k)
    jth = jth * _theta_dz(target.theta_transform, z_theta)[None, None, :]

    prec = np.zeros((dim, dim))
    # x block: B'KB/b0 + blockdiag(Cinv)/b1 + observation diagonal.
    pxx = np.empty((d, n, d, n))
    for p in range(d):
        for j in range(d):
            acc = np.zeros((n, n))
            for q in range(d):  # J'KJ
                acc += (
                    j0[:, q, p][:, None] * kinv[q] * j0[:, q, j][None, :]
                )
            acc -= j0[:, j, p][:, None] * km[j]        # J'KM
            acc -= km[p].T * j0[:, p, j][None, :]      # M'KJ
            if p == j:
                acc += mkm[p]                          # M'KM
            pxx[p, :, j, :] = acc
    prec[:nd, :nd] = pxx.reshape(nd, nd) / beta[0]
    for p in range(d):
        sl = slice(p * n, (p + 1) * n)
        prec[sl, sl] += cinv[p] / beta[1]
    prec[np.arange(nd), np.arange(nd)] += (
        mask.T.reshape(-1) / np.repeat(sigma_c**2, n) / beta[2]
    )

    # theta coupling: K B_th, then B' (K B_th) and B_th' (K B_th).
    kbth = np.stack(
        [kinv[q] @ jth[:, q, :] for q in range(d)]
    )  # (d, n, k)
    cross = np.concatenate(
        [
            sum(j0[:, q, p][:, None] * kbth[q] for q in range(d))
            - mphi[p].T @ kbth[p]
            for p in range(d)
        ],
        axis=0,
    ) / beta[0]  # (nd, k)
    prec[:nd, nd : nd + k] += cross
    prec[nd : nd + k, :nd] += cross.T
    ptt = sum(jth[:, q, :].T @ kbth[q] for q in range(d)) / beta[0]
    prec[nd : nd + k, nd : nd + k] += ptt
    if not target.sigma_is_fixed:
        prec[nd + k :, nd + k :] = np.diag(2.0 * cache["nobs"] / beta[2] + 1.0)

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


def make_exact_hessian_fn(target):
    """Reusable dense-Hessian evaluator for ``target.logdensity``: the
    evaluation point is a traced ARGUMENT of one jitted batched-HVP
    program, so Hessians at many points (mode + divergence-pocket probes,
    see parallel/chains.CurvatureEnvelope) share a single compile."""
    import jax

    logdensity = target.logdensity_fn()
    grad_fn = jax.grad(logdensity)

    @jax.jit
    def hvp_batch(psi, vs):
        return jax.vmap(
            lambda v: jax.jvp(grad_fn, (psi,), (v,))[1]
        )(vs)

    def hessian(psi_center: np.ndarray) -> np.ndarray:
        psi_center = np.asarray(psi_center, dtype=np.float64)
        dim = psi_center.shape[0]
        psi_j = jnp.asarray(psi_center)
        cols = []
        bs = 128
        eye = np.eye(dim)
        for s in range(0, dim, bs):
            cols.append(
                np.asarray(hvp_batch(psi_j, jnp.asarray(eye[s : s + bs])))
            )
        return np.concatenate(cols, axis=0)

    return hessian


def exact_hessian(target, psi_center: np.ndarray) -> np.ndarray:
    """Dense exact Hessian of ``target.logdensity`` at ``psi_center`` via
    batched HVPs (jvp of grad; float64 when x64 is live). Column batches
    bound peak memory to (batch, dim)."""
    return make_exact_hessian_fn(target)(psi_center)


def build_psi_whitener_exact(
    target,
    psi_center: np.ndarray,
    dtype,
    eig_floor: float = 1.0,
) -> PsiWhitener:
    """Whitener from the EXACT Hessian of the log-posterior at psi_center
    (float64 HVPs; eigendecomposition with a unit eigenvalue floor).

    Why not the Gauss-Newton precision: GN drops the second-order residual
    term sum_i r_i * grad^2 r_i of the whitened derivative residuals
    r = GKt e. The residuals do not vanish at the mode, and grad^2 r
    carries the GKt operator scale (~sqrt(1/jitter), growing with grid
    density), so on dense grids the dropped term DOMINATES: at n=793 the
    GN whitener overestimates the posterior scale ~1000x (measured:
    whitened lp falls to -1.1e6 at |z_i| ~ 0.02 where a correct whitener
    gives O(dim)); every sampler then adapts eps to the true ~6e-4 scale
    and looks "collapsed". At n=397 GN and exact agree (top whitened
    Hessian eigenvalue 1.19 measured) — the exact build is the safe
    default everywhere.

    ``eig_floor=1.0`` keeps flat directions (no curvature at the mode) at
    unit z-scale, the same convention as the GN build's theta ridge.
    """
    psi_center = np.asarray(psi_center, dtype=np.float64)
    hess = exact_hessian(target, psi_center)
    prec = -0.5 * (hess + hess.T)
    wv, vec = np.linalg.eigh(prec)
    wv = np.maximum(wv, eig_floor)
    # chol(P) for P = V diag(w) V': L = V diag(sqrt(w)) V' is NOT lower
    # triangular; use the actual Cholesky of the repaired matrix.
    prec_psd = (vec * wv) @ vec.T
    chol = _robust_chol(0.5 * (prec_psd + prec_psd.T))
    w = np.linalg.inv(chol).T
    return PsiWhitener(
        W=jnp.asarray(w, dtype=dtype),
        L_T=jnp.asarray(chol.T, dtype=dtype),
        center=jnp.asarray(psi_center, dtype=dtype),
    )


def _dense_free_solve(damped: np.ndarray, g: np.ndarray, free_idx):
    """Reduced Newton step on the free coordinates, dense path."""
    step = np.zeros(g.shape[0])
    chol = _robust_chol(damped[np.ix_(free_idx, free_idx)])
    step[free_idx] = _cho_solve(chol, g[free_idx])
    return step


def _banded_schur_solve(
    damped: np.ndarray,
    g: np.ndarray,
    n: int,
    d: int,
    bandsize: int,
    free_mask: np.ndarray,
):
    """Newton step exploiting the x-block's band structure.

    In time-major ordering (index i*D + p) the x block of the GN precision
    is banded: every term is a product of <=3 banded matrices of band
    ``bandsize`` scaled by diagonals, so couplings vanish beyond 3*bandsize
    time steps -> permuted lower bandwidth D*3*bandsize + (D-1). A banded
    Cholesky is O(nD bw^2) instead of O((nD)^3); the small free trailing
    block (theta, log sigma) is folded in by a Schur complement. Raises
    ``np.linalg.LinAlgError`` (caller falls back to the dense path) if
    scipy is unavailable or the banded factorization fails.
    """
    try:
        from scipy.linalg import cho_solve_banded, cholesky_banded
    except ImportError as e:  # pragma: no cover
        raise np.linalg.LinAlgError(str(e))

    nd = n * d
    dim = damped.shape[0]
    tail_idx = nd + np.where(free_mask[nd:])[0]
    m = len(tail_idx)

    perm = np.arange(nd).reshape(d, n).T.reshape(-1)  # new a -> old p*n+i
    axx = damped[:nd, :nd][np.ix_(perm, perm)]
    bw = min(nd - 1, 3 * bandsize * d + (d - 1))
    ab = np.zeros((bw + 1, nd))
    for r in range(bw + 1):
        ab[r, : nd - r] = np.diagonal(axx, offset=-r)
    chol_b = cholesky_banded(ab, lower=True)  # LinAlgError if not SPD

    inv_perm = np.empty(nd, dtype=np.int64)
    inv_perm[perm] = np.arange(nd)

    def solve_x(rhs):
        y = cho_solve_banded((chol_b, True), rhs[perm])
        return y[inv_perm]

    gx = g[:nd]
    y0 = solve_x(gx)
    step = np.zeros(dim)
    if m == 0:
        step[:nd] = y0
        return step
    c = damped[:nd, tail_idx]  # (nd, m)
    y_c = np.column_stack([solve_x(c[:, j]) for j in range(m)])
    schur = damped[np.ix_(tail_idx, tail_idx)] - c.T @ y_c
    schur = 0.5 * (schur + schur.T)
    chol_s = np.linalg.cholesky(schur)  # LinAlgError propagates to caller
    step_s = _cho_solve(chol_s, g[tail_idx] - c.T @ y0)
    step[:nd] = y0 - y_c @ step_s
    step[tail_idx] = step_s
    return step


def _newton_step(
    damped: np.ndarray,
    g: np.ndarray,
    n: int,
    d: int,
    bandsize: int,
    free_mask: np.ndarray,
):
    """Reduced Newton step over the free coordinates: banded+Schur when all
    x coordinates are free (the normal and sigma-frozen cases), a tiny
    dense solve when only the trailing block is free (the theta-only
    pre-stage), dense robust fallback otherwise."""
    nd = n * d
    x_free = free_mask[:nd]
    free_idx = np.where(free_mask)[0]
    if not x_free.any():
        return _dense_free_solve(damped, g, free_idx)
    if x_free.all():
        try:
            return _banded_schur_solve(damped, g, n, d, bandsize, free_mask)
        except np.linalg.LinAlgError:
            pass
    return _dense_free_solve(damped, g, free_idx)


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
    cache = make_precision_cache(gp_cov, yobs, target, prior_temperature)
    n_, d_ = cache["n"], cache["d"]
    # Frozen coordinates (slice or boolean mask) stay at their init: log
    # sigma (the sigma-inflated degenerate mode otherwise captures the
    # Newton flow) or everything-but-theta (the theta-only pre-stage in
    # solve.py). The step solves the REDUCED system on the free block.
    free_mask = np.ones(psi.shape[0], dtype=bool)
    if freeze is not None:
        free_mask[freeze] = False
    n_stalled = 0
    for it in range(n_newton):
        prec = build_precision(
            gp_cov, yobs, target, psi, prior_temperature, cache=cache
        )
        diag_scale = float(np.median(np.diag(prec)))
        g_np = np.asarray(g, dtype=np.float64)

        # Levenberg-Marquardt: far from the mode the pure GN step can be so
        # large that no backtracking fraction improves (measured at n=397);
        # damping (P + lam*s*I) shortens and bends the step toward the
        # gradient until it succeeds, then relaxes.
        improved = False
        for _lm in range(12):
            damped = prec
            if lam > 0:
                damped = prec + lam * diag_scale * np.eye(prec.shape[0])
            step = _newton_step(
                damped, g_np, n_, d_, cache["bandsize"], free_mask
            )
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
        # steps by construction — they must not trigger the stop outright;
        # see the stall counter below.)
        if lam == 0.0 and alpha == 1.0 and gain < min_improvement:
            break
        if lam == 0.0 and np.linalg.norm(alpha * step) < tol * (
            1.0 + np.linalg.norm(psi)
        ):
            break
        # Stall stop under CHRONIC damping: on hard landscapes (n=793,
        # measured) lam never relaxes and every step is fractional, so the
        # undamped-stop above never fires even when the iteration is only
        # polishing the last ~1 lp unit (gains decayed from ~1e6 to <0.05).
        # Five consecutive sub-threshold gains ends the stage as converged.
        n_stalled = n_stalled + 1 if gain < min_improvement else 0
        if n_stalled >= 5:
            break
        if it % 25 == 0:
            logger.debug(
                "GN it %d: lp %.6g lam %.3g alpha %.3g gain %.3g",
                it, v, lam, alpha, gain,
            )
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



def make_centered_whitened_vg(target, whitener: PsiWhitener):
    """Fused whitened value-and-grad with the x block evaluated
    MODE-CENTERED: dx = (W zeta)_x is used directly (never psi - center),
    and the center's operator products are float64 host constants
    (ops/likelihood.CenteredTerms). Mathematically identical to
    wrap_value_and_grad(target.value_and_grad_fn(), whitener); in float32
    it removes the |mphi| * eps_f32 cancellation noise that collapses raw
    NUTS step sizes on dense grids (measured: see CenteredTerms)."""
    import jax

    from ..ops.likelihood import (
        log_posterior_centered,
        make_centered_terms,
    )
    from .target import LOG_SIGMA_CLAMP

    n, d, k = target.n_times, target.n_dims, target.n_params_ode
    nd = n * d
    center = whitener.center
    x_ref = np.asarray(center[:nd], dtype=np.float64).reshape(d, n).T
    cent = make_centered_terms(target.data, x_ref, target.bandwidth)
    data, system = target.data, target.system
    sigma_fixed = target.sigma_init
    fixed = target.sigma_is_fixed
    transform = target.theta_transform
    bandwidth, use_pallas = target.bandwidth, target.use_pallas
    w_mat = whitener.W

    def logdensity_z(zeta):
        # Full-f32 precision: bf16 matmul noise here feeds the operators.
        dpsi = jnp.matmul(w_mat, zeta, precision=jax.lax.Precision.HIGHEST)
        dx = dpsi[:nd].reshape(d, n).T
        theta = center[nd : nd + k] + dpsi[nd : nd + k]
        jac = jnp.zeros((), dtype=zeta.dtype)
        if transform is not None:
            from .transforms import constrain

            theta, theta_jac = constrain(transform, theta)
            jac = jac + theta_jac
        if fixed:
            sigma = sigma_fixed
        else:
            clamped = jnp.clip(
                center[nd + k :] + dpsi[nd + k :],
                -LOG_SIGMA_CLAMP, LOG_SIGMA_CLAMP,
            )
            sigma = jnp.exp(clamped)
            jac = jac + jnp.sum(clamped)
        ll = log_posterior_centered(
            dx, theta, sigma, data, cent, system.f, bandwidth, use_pallas
        )
        return ll + jac

    return jax.value_and_grad(logdensity_z)


def wrap_value_and_grad(vg, whitener: PsiWhitener):
    """vg over psi -> vg over zeta (psi = center + W zeta). Gradient by the
    chain rule: g_zeta = W' g_psi (one extra matvec each way)."""

    import jax

    def vg_zeta(zeta):
        # Full-f32 precision: bf16 matmul noise breaks step-size adaptation.
        hi = jax.lax.Precision.HIGHEST
        psi = whitener.center + jnp.matmul(whitener.W, zeta, precision=hi)
        value, g_psi = vg(psi)
        return value, jnp.matmul(whitener.W.T, g_psi, precision=hi)

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
