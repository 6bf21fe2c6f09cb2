"""solve_magi — the end-to-end MAGI orchestrator.

Counterpart of the reference's solve_magi (/root/reference/src/MagiJl.jl:170-773)
with the same pipeline and result contract:

  config -> (phi, sigma) init via NLML -> x init via interpolation ->
  theta init from bounds -> GPCov build -> target -> NUTS -> results

TPU-native differences:
- the sampling loop is one jit region (warmup scan + sampling scan over the
  fused value-and-grad);
- ``n_chains`` chains run batched via vmap (sharded across devices with a
  mesh — see parallel/chains.py); the reference runs exactly one chain;
- failures raise informative exceptions instead of returning ``nothing``
  (the soft-fail path of MagiJl.jl:471,489,626-629); callers wanting the
  soft behavior can catch MagiError.
"""
from __future__ import annotations

import dataclasses
import logging
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MagiConfig
from ..models.base import OdeSystem
from ..ops.gp_cov import build_gp_cov
from .nlml import default_initial_guesses, optimize_gp_hyperparameters
from .target import MagiTarget

logger = logging.getLogger(__name__)


class MagiError(RuntimeError):
    pass


@dataclasses.dataclass
class MagiResult:
    """Result contract parity with the reference NamedTuple
    (theta, x_sampled, sigma, phi, lp) — MagiJl.jl:764-771. Multi-chain runs
    concatenate chains along the sample axis; per-chain arrays live in
    ``diagnostics``."""

    theta: np.ndarray       # (S, k)
    x_sampled: np.ndarray   # (S, n, D)
    sigma: np.ndarray       # (S, D)
    phi: np.ndarray         # (2, D)
    lp: np.ndarray          # (S,)
    diagnostics: Dict

    def keys(self):
        return ("theta", "x_sampled", "sigma", "phi", "lp")


def _init_x_interpolation(y_obs: np.ndarray, t_obs: np.ndarray) -> np.ndarray:
    """Linear interpolation of observations onto the full grid with linear
    extrapolation at the ends; constant for <2 obs; zeros for no obs.

    Parity: MagiJl.jl:352-410 (Interpolations.Line() extrapolation).
    """
    n, d = y_obs.shape
    x0 = np.zeros((n, d))
    for dim in range(d):
        idx = np.flatnonzero(np.isfinite(y_obs[:, dim]))
        if idx.size == 0:
            logger.warning("No observations in dimension %d; x init = 0.", dim)
            continue
        tv, yv = t_obs[idx], y_obs[idx, dim]
        tv, uniq = np.unique(tv, return_index=True)
        yv = yv[uniq]
        if tv.size < 2:
            x0[:, dim] = yv[0]
            continue
        vals = np.interp(t_obs, tv, yv)
        # np.interp clamps beyond the ends; extend linearly like Line().
        left = t_obs < tv[0]
        right = t_obs > tv[-1]
        if left.any():
            slope = (yv[1] - yv[0]) / (tv[1] - tv[0])
            vals[left] = yv[0] + slope * (t_obs[left] - tv[0])
        if right.any():
            slope = (yv[-1] - yv[-2]) / (tv[-1] - tv[-2])
            vals[right] = yv[-1] + slope * (t_obs[right] - tv[-1])
        x0[:, dim] = vals
    return x0


def _init_theta_from_bounds(system: OdeSystem) -> np.ndarray:
    """Bounds-midpoint initialization with nudging/clamping.

    Parity: MagiJl.jl:413-453."""
    lb = system.theta_lower_bound
    ub = system.theta_upper_bound
    k = system.theta_size
    theta = np.zeros(k)
    for i in range(k):
        lo, hi = lb[i], ub[i]
        if np.isfinite(lo) and np.isfinite(hi):
            theta[i] = 0.5 * (lo + hi)
        elif np.isfinite(lo):
            theta[i] = lo + abs(lo) * 0.1 + 0.1
        elif np.isfinite(hi):
            theta[i] = hi - abs(hi) * 0.1 - 0.1
        else:
            theta[i] = 0.0
        if np.isfinite(lo) and theta[i] <= lo:
            theta[i] = lo + 1e-4 * (min(1.0, hi - lo) if np.isfinite(hi) else 1.0)
        if np.isfinite(hi) and theta[i] >= hi:
            theta[i] = hi - 1e-4 * (min(1.0, hi - lo) if np.isfinite(lo) else 1.0)
        theta[i] = np.clip(theta[i], lo, hi)
    return theta


def map_warm_start(
    vg,
    psi0: np.ndarray,
    n_iters: int,
    lr: float,
    theta_slice: slice,
    theta_lb: np.ndarray,
    theta_ub: np.ndarray,
    dtype,
) -> np.ndarray:
    """Adam ascent on the fused log-posterior; theta projected into bounds
    (strict interior so 1/theta-style terms stay finite). Non-finite steps
    are rejected. Returns the best Psi seen."""
    import optax

    lb = jnp.asarray(
        np.where(np.isfinite(theta_lb), theta_lb, -np.inf), dtype
    )
    ub = jnp.asarray(np.where(np.isfinite(theta_ub), theta_ub, np.inf), dtype)
    margin = jnp.asarray(
        np.where(
            np.isfinite(theta_lb) & np.isfinite(theta_ub),
            1e-4 * np.minimum(theta_ub - theta_lb, 1.0),
            1e-4,
        ),
        dtype,
    )
    opt = optax.adam(lr)

    @jax.jit
    def run(psi):
        def step(carry, _):
            psi, st, best_psi, best_v = carry
            v, g = vg(psi)
            better = v > best_v
            best_psi = jnp.where(better, psi, best_psi)
            best_v = jnp.where(better, v, best_v)
            updates, st = opt.update(-g, st, psi)
            new_psi = optax.apply_updates(psi, updates)
            th = jnp.clip(new_psi[theta_slice], lb + margin, ub - margin)
            new_psi = new_psi.at[theta_slice].set(th)
            ok = jnp.all(jnp.isfinite(new_psi))
            new_psi = jnp.where(ok, new_psi, psi)
            return (new_psi, st, best_psi, best_v), v

        v0, _ = vg(psi)
        carry, vs = jax.lax.scan(
            step, (psi, opt.init(psi), psi, v0), None, length=n_iters
        )
        psi_f, _, best_psi, best_v = carry
        v_f, _ = vg(psi_f)
        return jnp.where(v_f > best_v, psi_f, best_psi), v0, jnp.maximum(v_f, best_v)

    psi_opt, v0, v1 = run(jnp.asarray(psi0, dtype))
    logger.info(
        "MAP warm start: log-posterior %.4g -> %.4g (%d Adam steps)",
        float(v0), float(v1), n_iters,
    )
    return np.asarray(psi_opt, dtype=np.float64)


def _run_resumed(vg, ckpt, config: MagiConfig, dtype):
    """Dispatch a resumed sampling leg to the sampler's resumed runner and
    normalize its info dict to the (C, S) layout solve_magi's results
    processing expects (the same normalization the fresh-run branches do).
    Returns (samples (C, S, dim), info, n_chains)."""
    if config.sampler == "chees":
        from .chees import run_chees_resumed

        samples, info, _ = run_chees_resumed(
            vg, ckpt, n_samples=config.niter_hmc,
            chunk_size=config.chunk_size, dtype=dtype,
            checkpoint_path=config.checkpoint_path,
            progress=config.verbose,
        )
        info = dict(info)
        n_chains = samples.shape[0]
    elif config.sampler == "pt-nuts":
        from .tempering import run_parallel_tempering_resumed

        s_pt, info, _ = run_parallel_tempering_resumed(
            vg, ckpt, n_samples=config.niter_hmc,
            target_accept=config.target_accept_ratio,
            max_depth=config.max_tree_depth,
            chunk_size=config.chunk_size, dtype=dtype,
            checkpoint_path=config.checkpoint_path,
            progress=config.verbose,
        )
        # Same (C, S) normalization as the fresh pt-nuts branch: each
        # replica's cold (T=1) rung is one posterior chain. The replica
        # count comes from the checkpoint shape.
        info = dict(info)
        if s_pt.ndim == 2:  # single ladder: (S, dim)
            n_chains = 1
            samples = s_pt[None]
            info["lp"] = info["lp"][None]
            info["accept_prob_per_rung"] = info["accept_prob"]
            info["tree_depth_per_rung"] = info["tree_depth"]
            for k_ in ("diverging", "num_leapfrog", "accept_prob",
                       "tree_depth"):
                info[k_] = info[k_][:, 0][None]
            info["final_psi"] = info["final_psi"][:1]
        else:  # (R, S, dim)
            n_chains = s_pt.shape[0]
            samples = s_pt
            info["lp"] = info["lp"].T
            info["accept_prob_per_rung"] = info["accept_prob"]
            info["tree_depth_per_rung"] = info["tree_depth"]
            for k_ in ("diverging", "num_leapfrog", "accept_prob",
                       "tree_depth"):
                info[k_] = info[k_][:, :, 0].T
            info["final_psi"] = info["final_psi"][:, 0]
    elif config.sampler == "nuts":
        from .checkpoint import run_chains_resumed, save_checkpoint

        samples, info, new_ckpt = run_chains_resumed(
            vg, ckpt, n_samples=config.niter_hmc,
            max_depth=config.max_tree_depth, dtype=dtype,
        )
        info = dict(info)
        info["final_psi"] = new_ckpt.psi
        info["final_key"] = new_ckpt.key
        n_chains = samples.shape[0]
        if config.checkpoint_path:
            save_checkpoint(config.checkpoint_path, new_ckpt)
    else:
        raise MagiError(f"unknown sampler '{config.sampler}'")
    # Per-transition stats the resumed runners do not track.
    lp = np.asarray(info["lp"])
    info.setdefault("accept_prob", np.ones_like(lp))
    info.setdefault("tree_depth", np.zeros_like(lp))
    info.setdefault("energy", np.zeros_like(lp))
    info["warmup_diverging"] = np.zeros((n_chains, 0))
    return samples, info, n_chains


def solve_magi(
    y_obs: np.ndarray,
    t_obs: np.ndarray,
    ode_system: OdeSystem,
    config: Optional[MagiConfig] = None,
    initial_params: Optional[np.ndarray] = None,
    mesh: Optional[jax.sharding.Mesh] = None,
    resume=None,
) -> MagiResult:
    """Solve the MAGI inference problem. See MagiConfig for options.

    ``initial_params`` optionally supplies the full Psi_0 =
    [vec(x); theta; log(sigma)] (parity: MagiJl.jl:175,526-569).
    ``mesh`` shards the sampler axis across devices (TPU-native
    extension): NUTS chains for ``sampler='nuts'`` (parallel/chains.py),
    PT replica ladders for ``sampler='pt-nuts'`` (tempering.py
    REPLICA_AXIS), and ChEES chains for ``sampler='chees'`` (chees.py —
    the per-iteration cross-chain adaptation statistics ride psum/pmean
    collectives over the chain axis).

    ``resume`` continues a previous run instead of warming up: pass the
    checkpoint written by that run (``config.checkpoint_path``, or
    ``checkpoint_from_result(result)``) either as a loaded object — a
    ``SamplerCheckpoint`` for ``sampler='nuts'``/``'chees'``, the dict
    from ``load_pt_checkpoint`` for ``'pt-nuts'`` — or as the ``.npz``
    path. The call must use the SAME data and config as the original run
    (the deterministic setup — NLML init, GP covariance, whitening mode —
    is re-derived so the checkpointed positions keep their meaning), and
    ``niter_hmc`` then counts ADDITIONAL post-warmup draws: step size,
    metric, temperature ladder, and trajectory length stay frozen at
    their checkpointed (adapted) values. The sampler axis size (chains /
    replicas) comes from the checkpoint, not the config. A WARMUP-phase
    checkpoint (the previous run died mid-warmup; written automatically
    at every warmup chunk for the production nuts + dense-pooled path)
    instead CONTINUES adaptation from the saved iteration — here the
    config is interpreted exactly as in the original run (``niter_hmc``
    is the total, not additional draws) and the result is bit-identical
    to an uninterrupted run. The reference has no checkpointing at all
    (SURVEY.md §5.4); its only warm start is ``initial_params``.
    """
    config = config or MagiConfig()
    t_start = time.time()
    # Persistent XLA compilation cache: repeat processes (benchmark
    # reruns, resumed jobs) skip minutes of first-compile stalls.
    # Opt out with MAGI_DISABLE_COMPILE_CACHE=1 (utils/compile_cache.py).
    from ..utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    y_obs = np.asarray(y_obs, dtype=np.float64)
    t_obs = np.asarray(t_obs, dtype=np.float64)
    if y_obs.ndim != 2:
        raise MagiError(f"y_obs must be (n_times, n_dims); got {y_obs.shape}")
    n_times, n_dims = y_obs.shape
    if t_obs.shape != (n_times,):
        raise MagiError("t_obs length must match y_obs rows")
    k = ode_system.theta_size
    dtype = config.resolved_dtype()

    kernel_type = config.kernel
    try:
        from ..ops.kernels import parse_kernel_type

        parse_kernel_type(kernel_type)
    except ValueError:
        logger.warning(
            "Unsupported kernel type '%s'. Defaulting to matern52 "
            "(parity MagiJl.jl:477-479).", kernel_type,
        )
        kernel_type = "matern52"
        config = dataclasses.replace(config, kernel="matern52")

    logger.info(
        "MAGI solve: n=%d, D=%d, k=%d, kernel=%s, dtype=%s",
        n_times, n_dims, k, config.kernel, np.dtype(dtype).name,
    )

    # --- sigma fixed/sampled decision (MagiJl.jl:222-243) ---
    sigma_exo = (
        np.asarray(config.sigma, dtype=np.float64)
        if config.sigma_provided else np.array([])
    )
    phi_exo = (
        np.asarray(config.phi, dtype=np.float64)
        if config.phi_provided else np.zeros((2, 0))
    )
    sigma_is_fixed = config.sigma_is_fixed
    if sigma_is_fixed:
        if sigma_exo.shape != (n_dims,):
            raise MagiError(
                f":sigma must have length {n_dims}; got {sigma_exo.shape}"
            )
        if phi_exo.shape != (2, n_dims):
            raise MagiError(
                f":phi must be (2, {n_dims}) when sigma is fixed; got {phi_exo.shape}"
            )
    elif sigma_exo.size and not phi_exo.size:
        logger.warning(
            "sigma provided without phi: sigma treated as unknown and "
            "re-initialized (parity MagiJl.jl:235-238)."
        )
        sigma_exo = np.array([])

    # --- phi / sigma initialization (MagiJl.jl:245-344) ---
    if phi_exo.size and sigma_is_fixed:
        phi_all = phi_exo
        sigma_init = sigma_exo
    else:
        guesses = default_initial_guesses(y_obs, t_obs)
        if phi_exo.size:
            guesses[:, 0] = np.log(np.maximum(phi_exo[0], 1e-10))
            guesses[:, 1] = np.log(np.maximum(phi_exo[1], 1e-10))
        optimized = optimize_gp_hyperparameters(
            y_obs, t_obs, config.kernel,
            initial_log_params=guesses,
            jitter=config.jitter,
            max_iters=config.gp_optim_iterations,
            ftol=config.gp_optim_ftol,
            gtol=config.gp_optim_gtol,
            show_trace=config.gp_optim_show_trace,
        )  # (D, 3): variance, lengthscale, sigma
        phi_all = phi_exo if phi_exo.size else optimized[:, :2].T
        sigma_init = np.maximum(optimized[:, 2], 1e-8)
    logger.info("phi:\n%s\ninitial sigma: %s%s",
                np.round(phi_all, 4), np.round(sigma_init, 4),
                " (fixed)" if sigma_is_fixed else "")
    if not (np.isfinite(phi_all).all() and (phi_all > 0).all()):
        raise MagiError(f"Invalid GP hyperparameters: {phi_all}")

    # --- x / theta init ---
    if config.x_init is not None and np.asarray(config.x_init).size:
        x_init = np.asarray(config.x_init, dtype=np.float64)
        if x_init.shape != (n_times, n_dims):
            raise MagiError(
                f":xInit must be ({n_times}, {n_dims}); got {x_init.shape}"
            )
    else:
        x_init = _init_x_interpolation(y_obs, t_obs)

    if config.theta_init is not None and len(np.atleast_1d(config.theta_init)):
        theta_init = np.asarray(config.theta_init, dtype=np.float64)
        if theta_init.shape != (k,):
            raise MagiError(f":thetaInit must have length {k}")
        lo, hi = ode_system.theta_lower_bound, ode_system.theta_upper_bound
        if (theta_init < lo).any() or (theta_init > hi).any():
            logger.warning("thetaInit outside bounds; clamping.")
            theta_init = np.clip(theta_init, lo, hi)
    else:
        theta_init = _init_theta_from_bounds(ode_system)

    # --- GP covariance structures (MagiJl.jl:457-492) ---
    gp_cov = build_gp_cov(
        config.kernel, phi_all, t_obs,
        bandsize=config.band_size, complexity=2, jitter=config.jitter,
        dtype=dtype, auto_escalate_bandsize=config.band_auto_escalate,
    )

    # --- target ---
    prior_temps = np.asarray(config.prior_temperature, dtype=np.float64)
    if prior_temps.shape != (3,):
        logger.warning(
            "priorTemperature should be [beta_deriv, beta_level, beta_obs]; "
            "broadcasting scalar (parity MagiJl.jl:498-505)."
        )
        prior_temps = np.full(3, float(np.atleast_1d(prior_temps)[0]))
    band_impl = config.band_impl
    if band_impl == "auto":
        # Dense (D, n, n) einsums ride the MXU and win for moderate n; the
        # O(n*b) band-storage path wins once n^2 HBM traffic dominates —
        # but only for SEQUENTIAL single-chain evaluation. Batched chains
        # turn the dense matvecs into matmuls whose n^2 matrix fetch
        # amortizes over the batch: measured on v5e at n=793 (band 80),
        # dense is 15.8k evals/s at batch 1 but 1.63M at batch 64 (12.5%
        # MFU, 63% HBM), while the Pallas band kernel stays ~9-14k at any
        # batch (vmap serializes the kernel grid). So any batched sampler
        # configuration prefers dense as long as the factor stacks fit
        # comfortably in HBM. Sequential crossover (band 20): dense 20.3k
        # vs pallas 17.4k at n=397, 1.2k vs 12.0k at n=3169.
        from ..ops.pallas_band import _tpu_available

        on_tpu = _tpu_available()
        eff_batch = (
            config.pt_temps * config.pt_replicas
            if config.sampler == "pt-nuts" else config.n_chains
        )
        dense_bytes = n_dims * 6 * n_times * n_times * 4
        from ..ops.pallas_band import _PALLAS_MAX_BANDWIDTH

        if n_times <= (512 if on_tpu else 1024):
            band_impl = "dense"
        elif eff_batch >= 8 and dense_bytes <= 2 << 30:
            band_impl = "dense"
        elif gp_cov.bandsize > _PALLAS_MAX_BANDWIDTH:
            # Band-path flops scale with the band width; past this point
            # even SEQUENTIAL dense einsums win (n=3169: dense 1.2k evals/s
            # vs the XLA band path's ~W-scaled ~0.6k at band 160), and the
            # Pallas kernel's unrolled rolls stop compiling.
            band_impl = "dense"
        else:
            band_impl = "pallas" if on_tpu else "band"
    logger.info("band_impl: %s (bandsize %d)", band_impl, gp_cov.bandsize)

    theta_transform = None
    if config.theta_constrained:
        from .transforms import make_theta_transform

        theta_transform = make_theta_transform(
            ode_system.theta_lower_bound, ode_system.theta_upper_bound
        )

    gp_mean = config.gp_mean
    if isinstance(gp_mean, str):
        if gp_mean != "observed":
            raise MagiError(f"unknown gp_mean mode '{gp_mean}'")
        means = np.zeros(n_dims)
        for dim in range(n_dims):
            finite = y_obs[:, dim][np.isfinite(y_obs[:, dim])]
            if finite.size:
                means[dim] = finite.mean()
        gp_mean = means
        logger.info("gp_mean='observed' -> %s", np.round(means, 4))

    target = MagiTarget.build(
        y_obs, gp_cov, ode_system, sigma_init, prior_temps,
        sigma_is_fixed, dtype=dtype, band_impl=band_impl,
        theta_transform=theta_transform, gp_mean=gp_mean,
    )

    # --- Psi_0 assembly (MagiJl.jl:526-569) ---
    if initial_params is not None:
        psi0 = np.asarray(initial_params, dtype=np.float64).copy()
        if psi0.shape != (target.dimension,):
            raise MagiError(
                f"initial_params must have length {target.dimension} "
                f"(sigma {'fixed' if sigma_is_fixed else 'sampled'}); got {psi0.shape}"
            )
        ts, te = n_times * n_dims, n_times * n_dims + k
        th = psi0[ts:te]
        lo, hi = ode_system.theta_lower_bound, ode_system.theta_upper_bound
        if (th < lo).any() or (th > hi).any():
            logger.warning("theta part of initial_params outside bounds; clamping.")
            psi0[ts:te] = np.clip(th, lo, hi)
    else:
        parts = [x_init.T.reshape(-1), theta_init]
        if not sigma_is_fixed:
            parts.append(np.log(np.maximum(sigma_init, 1e-8)))
        psi0 = np.concatenate(parts)

    if theta_transform is not None:
        # Sample theta on the unconstrained scale.
        from .transforms import unconstrain

        ts, te = n_times * n_dims, n_times * n_dims + k
        psi0[ts:te] = unconstrain(theta_transform, psi0[ts:te])
    logger.info("Sampling dimension: %d", psi0.shape[0])

    # --- NUTS (MagiJl.jl:577-604) ---
    n_adapts = int(np.floor(config.niter_hmc * config.burnin_ratio))
    vg = target.value_and_grad_fn()

    if config.map_init_iterations > 0:
        if theta_transform is None:
            map_lb = ode_system.theta_lower_bound
            map_ub = ode_system.theta_upper_bound
        else:
            # theta slot holds unconstrained z: no projection needed.
            map_lb = np.full(k, -np.inf)
            map_ub = np.full(k, np.inf)
        psi0 = map_warm_start(
            vg, psi0, config.map_init_iterations, config.map_init_lr,
            slice(n_times * n_dims, n_times * n_dims + k),
            map_lb, map_ub, dtype,
        )

    # --- Laplace whitening of Psi (TPU-native extension; whiten.py) ---
    whitener = None
    if config.x_whitened:
        from .whiten import (
            build_psi_whitener,
            build_psi_whitener_exact,
            gauss_newton_map,
            make_centered_whitened_vg,
        )

        # Adam stalls far from the mode (curvature spans ~6 orders of
        # magnitude) and a whitener built off-mode misleads the sampler;
        # damped Gauss-Newton with the same precision model reaches the
        # mode in a few iterations, then the whitener is built there.
        # The Newton line search needs float64 values (f32 representation
        # noise at |lp| ~ 1e5 stalls it early), so when sampling in f32 the
        # MAP runs on a float64 CPU replica of the target — setup-time only.
        # Optimizer tempering: observation tempering (beta_obs > 1) makes
        # the landscape so nonlinear that even damped Newton crawls
        # (measured: lp -2e10 -> -3e3 in 200 iterations at n=397); staging
        # the optimization — first at beta_obs = 1 (benign landscape), then
        # at the target temperature from that mode — restores convergence.
        freeze = (
            None if sigma_is_fixed
            else slice(n_times * n_dims + k, target.dimension)
        )
        # theta-only pre-stage: everything EXCEPT the theta slots frozen.
        # With X pinned to the data interpolant the degenerate basin
        # (theta ~ 0 -> flat trajectories) cannot flatten the derivative
        # error, so theta lands in the data basin regardless of the
        # bounds-midpoint init (measured on FN n=397: joint GN from
        # theta=0.1 flows to the degenerate mode at lp -566; with the
        # theta pre-stage it reaches the data mode at lp -46).
        theta_freeze = np.ones(target.dimension, dtype=bool)
        theta_freeze[n_times * n_dims : n_times * n_dims + k] = False
        stages = [prior_temps]
        if prior_temps[2] > 1.001:
            stages = [
                np.array([prior_temps[0], prior_temps[1], 1.0]),
                prior_temps,
            ]

        def _gn_stages(make_target_vg, gp_cov_for_map, psi):
            # The pre-stage optimizes theta against the FROZEN interpolated
            # X, whose own derivative error dominates lp — it cannot (and
            # need not) "converge"; a fixed small budget suffices to land
            # theta in the data basin, so the cap is expected, not a
            # warning condition.
            vg_0, target_0 = make_target_vg(stages[0])
            psi = gauss_newton_map(
                vg_0, gp_cov_for_map, y_obs, target_0, psi,
                stages[0], freeze=theta_freeze, n_newton=50,
                warn_on_cap=False,
            )
            # Budget scales with the state dimension: at n=793 the damped
            # iteration crawls ~2%/step under chronic Levenberg damping and
            # needs ~450 iterations to the mode (measured; the stall-stop
            # in gauss_newton_map ends the stage once gains die out, so the
            # larger cap only costs time when it is actually converging).
            budget = 200 if n_times * n_dims <= 1000 else 600
            for stage_temps in stages:
                vg_stage, target_stage = make_target_vg(stage_temps)
                psi = gauss_newton_map(
                    vg_stage, gp_cov_for_map, y_obs, target_stage, psi,
                    stage_temps, freeze=freeze, n_newton=budget,
                )
            return psi

        if dtype == jnp.float64:
            gp_cov_map = gp_cov

            def make_target_vg(stage_temps):
                t_s = MagiTarget.build(
                    y_obs, gp_cov_map, ode_system, sigma_init, stage_temps,
                    sigma_is_fixed, dtype=jnp.float64, band_impl="dense",
                    theta_transform=theta_transform, gp_mean=gp_mean,
                )
                return jax.jit(t_s.value_and_grad_fn()), t_s

            psi0 = _gn_stages(make_target_vg, gp_cov_map, psi0)
        else:
            with jax.enable_x64(), jax.default_device(jax.devices("cpu")[0]):
                gp_cov_map = build_gp_cov(
                    config.kernel, phi_all, t_obs,
                    bandsize=config.band_size, complexity=2,
                    jitter=config.jitter, dtype=jnp.float64,
                    check_eigenvalues=False,
                    auto_escalate_bandsize=config.band_auto_escalate,
                )

                def make_target_vg(stage_temps):
                    t_s = MagiTarget.build(
                        y_obs, gp_cov_map, ode_system, sigma_init,
                        stage_temps, sigma_is_fixed, dtype=jnp.float64,
                        band_impl="dense", theta_transform=theta_transform,
                        gp_mean=gp_mean,
                    )
                    return jax.jit(t_s.value_and_grad_fn()), t_s

                psi0 = _gn_stages(make_target_vg, gp_cov_map, psi0)
        # Whitener from the EXACT Hessian at the mode (f64 replica target;
        # GN drops residual-curvature terms that dominate on dense grids —
        # build_psi_whitener_exact docstring has the measurements). Falls
        # back to the GN precision if the Hessian pass fails.
        with jax.enable_x64(), jax.default_device(jax.devices("cpu")[0]):
            target_h = MagiTarget.build(
                y_obs, gp_cov_map, ode_system, sigma_init, prior_temps,
                sigma_is_fixed, dtype=jnp.float64, band_impl="dense",
                theta_transform=theta_transform, gp_mean=gp_mean,
            )
            try:
                whitener = build_psi_whitener_exact(target_h, psi0, dtype)
            except Exception:
                logger.warning(
                    "exact-Hessian whitener failed; using the GN precision."
                )
                whitener = build_psi_whitener(
                    gp_cov_map, y_obs, target, psi0, prior_temps, dtype
                )
        # Mode-centered evaluation (not the generic wrap): kills the f32
        # cancellation noise of |mphi| * x products that otherwise
        # collapses adapted step sizes on dense grids (whiten.py
        # make_centered_whitened_vg; measured 1e-5 -> healthy eps).
        vg = make_centered_whitened_vg(target, whitener)
        psi0 = np.zeros(target.dimension)
        logger.info("Psi whitening enabled (Gauss-Newton Laplace at mode)")

    # --- divergence-informed curvature envelope (parallel/chains.py
    # CurvatureEnvelope): exact Hessian probes at divergent warmup
    # positions, PSD-max folded into the pooled dense metric. The probe
    # evaluates the f64 CPU replica target at psi = center + W z and
    # conjugates through the whitener (H_z = W' H_psi W).
    envelope = None
    if config.divergence_envelope and config.sampler == "nuts":
        if config.mass_matrix != "dense-pooled" or whitener is None:
            logger.warning(
                "divergence_envelope requires sampler='nuts' with "
                "mass_matrix='dense-pooled' and x_whitened=True; disabled."
            )
        else:
            from ..parallel.chains import CurvatureEnvelope
            from .whiten import make_exact_hessian_fn

            hess_psi_fn = make_exact_hessian_fn(target_h)
            logp_psi_fn = jax.jit(target_h.logdensity_fn())
            w64 = np.asarray(whitener.W, dtype=np.float64)
            c64 = np.asarray(whitener.center, dtype=np.float64)

            def hess_z(z):
                psi_probe = c64 + w64 @ np.asarray(z, dtype=np.float64)
                with jax.enable_x64(), jax.default_device(
                    jax.devices("cpu")[0]
                ):
                    h = hess_psi_fn(psi_probe)
                p = -0.5 * (h + h.T)
                pz = w64.T @ p @ w64
                return 0.5 * (pz + pz.T)

            def logp_z(z):
                psi_probe = c64 + w64 @ np.asarray(z, dtype=np.float64)
                with jax.enable_x64(), jax.default_device(
                    jax.devices("cpu")[0]
                ):
                    return float(logp_psi_fn(jnp.asarray(psi_probe)))

            envelope = CurvatureEnvelope(
                hess_z, logp_fn=logp_z,
                max_points=config.envelope_max_points,
            )

    n_chains = int(config.n_chains)
    key = jax.random.PRNGKey(config.seed)

    from ..parallel.chains import run_chains

    psi0_chains = np.tile(psi0, (n_chains, 1))
    if config.chain_init_jitter > 0 and n_chains > 1:
        rng_init = np.random.default_rng(config.seed + 1)
        psi0_chains[1:] += config.chain_init_jitter * rng_init.standard_normal(
            psi0_chains[1:].shape
        )

    import contextlib

    profile_cm = (
        jax.profiler.trace(config.profile_dir)
        if config.profile_dir else contextlib.nullcontext()
    )

    if resume is not None:
        if isinstance(resume, str):
            if config.sampler == "pt-nuts":
                from .tempering import load_pt_checkpoint

                resume = load_pt_checkpoint(resume)
            else:
                from .checkpoint import load_checkpoint

                resume = load_checkpoint(resume)
        ck_dim = int(
            np.asarray(
                resume["qs"] if isinstance(resume, dict) else resume.psi
            ).shape[-1]
        )
        if ck_dim != target.dimension:
            raise MagiError(
                f"resume checkpoint dimension {ck_dim} does not match the "
                f"target dimension {target.dimension} — the resumed call "
                "must use the same data and config as the original run."
            )

    # A warmup-phase checkpoint (the run died DURING warmup — see
    # inference/checkpoint.py) resumes through the normal sampler branch:
    # run_chains replays the window-aligned chunk schedule from the saved
    # iteration with the saved adaptation state, bit-identical to an
    # uninterrupted run. Only the production path (nuts + dense-pooled)
    # supports this.
    warmup_resume = None
    if resume is not None and getattr(resume, "phase", "sampling") == "warmup":
        if config.sampler != "nuts" or config.mass_matrix != "dense-pooled":
            raise MagiError(
                "warmup-phase checkpoints resume only for sampler='nuts' "
                "with mass_matrix='dense-pooled' (the production path); "
                "other samplers restart warmup."
            )
        warmup_resume = resume
        resume = None

    t_sample = time.time()
    with profile_cm:
        if resume is not None:
            samples, info, n_chains = _run_resumed(vg, resume, config, dtype)
        elif config.sampler == "chees":
            from .chees import run_chees

            samples, info = run_chees(
                vg,
                jnp.asarray(psi0_chains, dtype=dtype),
                key,
                n_samples=config.niter_hmc,
                n_adapts=n_adapts,
                initial_step_size=config.step_size_factor,
                target_accept=config.target_accept_ratio,
                chunk_size=config.chunk_size,
                progress=config.verbose,
                criterion=config.chees_criterion,
                checkpoint_path=config.checkpoint_path,
                mesh=mesh,  # shards the chain axis; cross-chain stats psum
            )
        elif config.sampler == "pt-nuts":
            from .tempering import run_parallel_tempering

            if n_chains != 1:
                logger.warning(
                    "sampler='pt-nuts' runs pt_replicas independent "
                    "temperature ladders; n_chains=%d ignored.", n_chains,
                )
            n_rep = int(config.pt_replicas)
            n_chains = n_rep
            s_pt, info = run_parallel_tempering(
                vg,
                jnp.asarray(psi0_chains[0], dtype=dtype),
                key,
                n_samples=config.niter_hmc,
                n_adapts=n_adapts,
                n_temps=config.pt_temps,
                max_temp=config.pt_max_temp,
                initial_step_size=config.step_size_factor,
                target_accept=config.target_accept_ratio,
                max_depth=config.max_tree_depth,
                chunk_size=config.chunk_size,
                progress=config.verbose,
                ladder_adapt=config.pt_ladder_adapt,
                checkpoint_path=config.checkpoint_path,
                n_replicas=n_rep,
                mass_matrix=config.mass_matrix,
                mesh=mesh,  # shards the replica axis (tempering.py)
            )
            # normalize info to the (C, S) layout of run_chains; the cold
            # (T=1) rung of each replica is one posterior chain.
            info = dict(info)
            # Per-rung sampler-health stats (accept_prob/tree_depth, real
            # NUTS transition values — not fabricated defaults) keep their
            # full per-rung stacks under *_per_rung; the standard keys take
            # row 0. NB the conventions differ by design (tempering.py
            # pt_step out-tuple): accept_prob/tree_depth/num_leapfrog are
            # RUNG-ordered (pre-swap; row 0 = the rung-0 transition, the
            # step-size-health convention) while diverging is swap-permuted
            # to travel with the emitted cold-chain positions.
            if n_rep == 1:
                samples = s_pt[None]  # (1, S, dim)
                info["lp"] = info["lp"][None]
                info["accept_prob_per_rung"] = info["accept_prob"]
                info["tree_depth_per_rung"] = info["tree_depth"]
                for k_ in ("diverging", "num_leapfrog", "accept_prob",
                           "tree_depth"):
                    info[k_] = info[k_][:, 0][None]
                info["final_psi"] = info["final_psi"][:1]
            else:
                samples = s_pt  # (R, S, dim)
                info["lp"] = info["lp"].T  # (S, R) -> (R, S)
                info["accept_prob_per_rung"] = info["accept_prob"]
                info["tree_depth_per_rung"] = info["tree_depth"]
                for k_ in ("diverging", "num_leapfrog", "accept_prob",
                           "tree_depth"):
                    info[k_] = info[k_][:, :, 0].T
                info["final_psi"] = info["final_psi"][:, 0]  # cold rungs
            info["energy"] = np.zeros_like(info["lp"])
            info["warmup_diverging"] = np.zeros((n_chains, 0))
        elif config.sampler == "nuts":
            samples, info = run_chains(
                vg,
                jnp.asarray(psi0_chains, dtype=dtype),
                jax.random.split(key, n_chains),
                n_samples=config.niter_hmc,
                n_adapts=n_adapts,
                initial_step_size=config.step_size_factor,
                target_accept=config.target_accept_ratio,
                max_depth=config.max_tree_depth,
                mesh=mesh,
                chunk_size=config.chunk_size,
                progress=config.verbose,
                checkpoint_path=config.checkpoint_path,
                mass_matrix=config.mass_matrix,
                step_jitter=config.step_jitter,
                step_jitter_low=config.step_jitter_low,
                resume_ckpt=warmup_resume,
                envelope=envelope,
            )
        else:
            raise MagiError(f"unknown sampler '{config.sampler}'")
    samples = np.asarray(samples)  # (C, S, dim)
    sampling_time = time.time() - t_sample

    # --- results processing (MagiJl.jl:633-771) ---
    n_keep = samples.shape[1]
    if whitener is not None:
        from .whiten import zeta_to_psi_np

        samples = zeta_to_psi_np(
            whitener, samples.reshape(-1, samples.shape[-1])
        ).reshape(samples.shape)
    flat = samples.reshape(n_chains * n_keep, -1)
    x_samples = (
        flat[:, : n_times * n_dims]
        .reshape(-1, n_dims, n_times)
        .transpose(0, 2, 1)
    )
    theta_samples = flat[:, n_times * n_dims : n_times * n_dims + k]
    if theta_transform is not None:
        from .transforms import constrain_np

        theta_samples = constrain_np(theta_transform, theta_samples)
    if sigma_is_fixed:
        sigma_samples = np.tile(sigma_init, (flat.shape[0], 1))
    else:
        sigma_samples = np.exp(flat[:, n_times * n_dims + k :])
    lp = np.asarray(info["lp"]).reshape(-1)

    n_div = int(np.sum(np.asarray(info["diverging"])))
    if n_div:
        logger.warning("%d divergent transitions after warmup.", n_div)

    diagnostics = {
        "accept_prob": np.asarray(info["accept_prob"]),
        "num_leapfrog": np.asarray(info["num_leapfrog"]),
        "tree_depth": np.asarray(info["tree_depth"]),
        "diverging": np.asarray(info["diverging"]),
        "energy": np.asarray(info["energy"]),
        "step_size": np.asarray(info["step_size"]),
        "inv_mass": np.asarray(info["inv_mass"]),
        "n_divergent": n_div,
        "n_chains": n_chains,
        "final_psi": np.asarray(info["final_psi"]),
        "final_key": np.asarray(info["final_key"]),
        "lp_per_chain": np.asarray(info["lp"]),
        "theta_per_chain": theta_samples.reshape(n_chains, n_keep, k),
        "sampling_time_s": sampling_time,
        "total_time_s": time.time() - t_start,
        "gradient_evals": float(np.sum(np.asarray(info["num_leapfrog"]))),
        "sigma_is_fixed": sigma_is_fixed,
        "sampler": config.sampler,
        "band_impl": band_impl,
        "bandsize": int(gp_cov.bandsize),
    }
    if "trajectory_length" in info:
        diagnostics["trajectory_length"] = info["trajectory_length"]
    if "trajectory_warmup_trace" in info:
        diagnostics["trajectory_warmup_trace"] = info[
            "trajectory_warmup_trace"
        ]
    if "swap_acceptance" in info:
        diagnostics["swap_acceptance"] = info["swap_acceptance"]
        diagnostics["temperatures"] = info["temperatures"]
        if "swap_acceptance_per_pair" in info:
            diagnostics["swap_acceptance_per_pair"] = info[
                "swap_acceptance_per_pair"
            ]
    for k_ in ("accept_prob_per_rung", "tree_depth_per_rung"):
        if k_ in info:
            diagnostics[k_] = np.asarray(info[k_])
    for k_ in ("envelope_points", "envelope_boost_dirs",
               "envelope_boost_max"):
        if k_ in info:
            diagnostics[k_] = info[k_]
    return MagiResult(
        theta=theta_samples,
        x_sampled=x_samples,
        sigma=sigma_samples,
        phi=np.asarray(phi_all),
        lp=lp,
        diagnostics=diagnostics,
    )
