"""Typed configuration for the MAGI solver.

Mirrors the reference's ``Dict{Symbol,Any}`` config keys and defaults
(/root/reference/src/MagiJl.jl:208-220, 266-271) as a frozen dataclass, plus
TPU-native extensions (chain count, dtype policy, PRNG seed).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def default_dtype() -> jnp.dtype:
    """Working dtype of the sampling hot path.

    float64 when the x64 flag is on (CPU test/parity mode), float32 otherwise
    (TPU production mode). GP covariance setup always runs in float64 on host
    (see ops/gp_cov.py) regardless of this value.
    """
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


@dataclasses.dataclass(frozen=True)
class MagiConfig:
    """Solver configuration.

    Field-by-field parity with the reference config dictionary
    (/root/reference/src/MagiJl.jl:208-220):

    - ``kernel``            <-> ``:kernel``            (default "matern52")
    - ``niter_hmc``         <-> ``:niterHmc``          (default 20000)
    - ``burnin_ratio``      <-> ``:burninRatio``       (default 0.5)
    - ``step_size_factor``  <-> ``:stepSizeFactor``    (default 0.01)
    - ``band_size``         <-> ``:bandSize``          (default 20)
    - ``prior_temperature`` <-> ``:priorTemperature``  ([beta_deriv, beta_level, beta_obs])
    - ``sigma``             <-> ``:sigma``             (known noise SDs; fixed iff phi also given)
    - ``phi``               <-> ``:phi``               (known GP hyperparams, shape (2, D))
    - ``x_init``            <-> ``:xInit``
    - ``theta_init``        <-> ``:thetaInit``
    - ``target_accept_ratio`` <-> ``:targetAcceptRatio`` (default 0.8)
    - ``jitter``            <-> ``:jitter``            (default 1e-6)
    - ``gp_optim_iterations`` <-> ``:gpOptimIterations`` (default 100)
    - ``gp_optim_ftol``     <-> ``:gpOptimFTol``       (default 1e-8)
    - ``gp_optim_gtol``     <-> ``:gpOptimGTol``       (default 1e-8)
    - ``gp_optim_show_trace`` <-> ``:gpOptimShowTrace`` (default False)
    - ``verbose``           <-> ``:verbose``

    TPU-native extensions (no reference counterpart):

    - ``n_chains``: NUTS chains batched via vmap (sharded over devices when a
      mesh is supplied to solve_magi).
    - ``max_tree_depth``: NUTS doubling cap (Stan default 10).
    - ``seed``: PRNG seed (the reference uses Julia's global RNG).
    - ``dtype``: hot-path dtype; None -> default_dtype().
    """

    kernel: str = "matern52"
    niter_hmc: int = 20000
    burnin_ratio: float = 0.5
    step_size_factor: float = 0.01
    band_size: int = 20
    prior_temperature: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    sigma: Optional[Sequence[float]] = None
    phi: Optional[np.ndarray] = None
    x_init: Optional[np.ndarray] = None
    theta_init: Optional[Sequence[float]] = None
    target_accept_ratio: float = 0.8
    jitter: float = 1e-6
    gp_optim_iterations: int = 100
    # L-BFGS convergence tolerances for the NLML hyperparameter init
    # (Optim.jl semantics: relative objective change / gradient inf-norm;
    # reference defaults, MagiJl.jl:266-271). The optimizer early-stops
    # inside its fixed-length scan once either is met.
    gp_optim_ftol: float = 1e-8
    gp_optim_gtol: float = 1e-8
    # Log per-iteration NLML values (reference :gpOptimShowTrace).
    gp_optim_show_trace: bool = False
    verbose: bool = False

    # TPU-native extensions
    n_chains: int = 1
    max_tree_depth: int = 10
    seed: int = 0
    # "nuts" (reference-equivalent sampler), "chees" (ChEES-HMC, Hoffman et
    # al. 2021: jittered fixed-length HMC, chains batch into single tensor
    # ops; best with n_chains >= 8), or "pt-nuts" (parallel tempering: a
    # ladder of pt_temps tempered NUTS chains with Metropolis swaps —
    # crosses posterior modes single chains cannot; returns the T=1
    # chain's draws).
    # "chees" converges on MAGI posteriors since the trajectory length
    # entered sampling as the ITERATE AVERAGE of warmup iterates
    # (head-to-head vs NUTS on the FN workload, docs/BENCHMARKS.md
    # config 7: R-hat 1.011-1.018 and min ESS 3390-4865 on all 3 seeds;
    # before the fix 2 of 3 seeds sat at R-hat 1.44-1.57). NUTS remains
    # the production default: its ESS/sec is still ~2x higher on this
    # posterior (per-leaf cost is lower only for ChEES, but NUTS gets
    # more ESS per gradient).
    sampler: str = "nuts"
    # Trajectory-length criterion for sampler='chees': "snaper" (principal-
    # component projection — robust on multiscale targets) or "chees"
    # (squared-norm change — the original criterion; collapses on the MAGI
    # posterior, kept for parity with Hoffman et al. 2021).
    chees_criterion: str = "snaper"
    pt_temps: int = 8
    # None -> dimension-aware ladder spacing (1 + sqrt(2/dim))^k, which
    # keeps adjacent-rung swap acceptance usable in high dimension.
    pt_max_temp: Optional[float] = None
    # Adapt the ladder spacing during warmup toward equidistributed
    # per-pair swap rejection (Syed et al. 2021). False = static ladder.
    pt_ladder_adapt: bool = True
    # Independent PT ladders run as one vmapped program (replica axis x
    # ladder axis). ESS scales ~linearly in replicas while wall time grows
    # sublinearly (the per-rung problem underutilizes the chip — measured
    # batch scaling in docs/BENCHMARKS.md); replicas also give real
    # split-R-hat across independent cold chains. Ladder adaptation pools
    # swap statistics across replicas.
    pt_replicas: int = 1
    dtype: Optional[jnp.dtype] = None
    # Metric adaptation for sampler='nuts' and 'pt-nuts': "diag" =
    # per-chain/per-rung diagonal Welford (Stan parity); "dense-pooled" =
    # shared dense metric(s) estimated from pooled in-window draws at every
    # adaptation-window boundary (parallel/chains.py for chains;
    # tempering.py pools across replicas per rung). The batch acts as the
    # estimator: pooled draws resolve the posterior's correlation structure
    # (e.g. the weakly-identified theta_b ridge of the FN posterior) that
    # no per-chain diagonal can, cutting tree-depth saturation. Estimates
    # shrink toward the identity (the whitened unit scale) with weight
    # n_samples/(n_samples + dim), so thin windows stay safe.
    mass_matrix: str = "diag"
    # Hot-path memory layout: "auto" picks dense einsums for moderate grids
    # and the band-storage path (Pallas kernel on TPU) for large ones.
    band_impl: str = "auto"
    # Widen the band automatically (doubling, capped at n-1) when the PSD
    # repair of the band-truncated precision matrices needs a diagonal
    # shift > 1% of matrix scale — i.e. when bandSize is too narrow for the
    # fitted lengthscales and the truncated quadratic forms would deviate
    # from the full-band posterior. False keeps the requested band exactly
    # (closest to the reference's silent indefinite truncation).
    band_auto_escalate: bool = True
    # Sampler iterations per device call (bounds single-execution length,
    # streams samples to host, enables progress logging).
    chunk_size: int = 1000
    # Gaussian dispersion of chains 1..C-1 around Psi_0 (chain 0 starts
    # exactly at Psi_0). Overdispersed starts make split-R-hat meaningful.
    chain_init_jitter: float = 0.0
    # Post-warmup step-size jitter (sampler='nuts' with
    # mass_matrix='dense-pooled'): with this probability per iteration the
    # shared frozen step size is scaled by a log-uniform multiplier in
    # [step_jitter_low, 1] for that single iteration — drawn host-side
    # before sampling, so the transition kernel stays exactly
    # target-invariant (Stan-style stepsize_jitter, downward-only).
    # Rescue mechanism for localized sharp-curvature pockets that the
    # global whitener/metric cannot flatten (the FN theta_b~0.48 pocket:
    # a chain entering it at the bulk-adapted eps diverges ~64% of
    # iterations and freezes; a jittered small-eps iteration lets it step
    # out). Costs ~p*((1/low-1)/ln(1/low)-1) extra leapfrogs (~8% at
    # 0.125/0.4). 0 = off (reference parity — the reference has no
    # equivalent; AdvancedHMC would assert on the pocket's -Inf instead).
    step_jitter: float = 0.0
    step_jitter_low: float = 0.4
    # Divergence-informed curvature envelope (sampler='nuts' with
    # mass_matrix='dense-pooled' and x_whitened=True): positions where
    # warmup chains diverge are probed with the exact posterior Hessian
    # (reusing the whitener's HVP program) and the pooled dense metric is
    # PSD-max folded against each probe at every adaptation-window
    # boundary — only directions where pocket curvature exceeds the pooled
    # precision get more metric mass; the bulk geometry is untouched and
    # the metric stays frozen after warmup (valid NUTS). The PRINCIPLED
    # pocket fix (vs step_jitter's global eps tax): see
    # parallel/chains.py CurvatureEnvelope. False = off (reference parity).
    divergence_envelope: bool = False
    # Max Hessian probes per run (each costs one dim-column HVP sweep on
    # the host f64 replica at setup — a few seconds at n=397).
    envelope_max_points: int = 4
    # When set, wraps sampling in jax.profiler.trace writing to this dir.
    profile_dir: Optional[str] = None
    # When set, a sampler checkpoint (.npz) is written after every sampling
    # chunk for preemption-safe resume: inference/checkpoint.py for 'nuts',
    # tempering.py pt_checkpoint for 'pt-nuts', chees.py chees_checkpoint
    # for 'chees' (run_chees_resumed continues the Halton sequence).
    checkpoint_path: Optional[str] = None
    # MAP warm start: Adam steps maximizing the fused log-posterior over
    # Psi before sampling (theta projected into bounds). 0 disables
    # (reference-like behavior: sampling starts at the heuristic init).
    # Strongly recommended on TPU/float32: starting near the posterior mode
    # keeps |log-posterior| small where f32 resolution is fine, and avoids
    # the frozen-chain -> collapsed-metric failure mode of bad inits.
    map_init_iterations: int = 0
    map_init_lr: float = 0.01
    # Sample theta through a Stan-style bounded reparameterization (bounds
    # enforced with Jacobian correction). False = reference parity: bounds
    # only applied at initialization (MagiJl.jl:413-453), chains may cross.
    theta_constrained: bool = False
    # Whiten the latent states: sample z with x = x_init + W z where W is
    # the inverse Cholesky of the posterior's Gaussian x-precision
    # (inference/whiten.py). Exactly posterior-preserving; collapses the
    # GP-induced condition number (~1e6) of the x-block so NUTS stops
    # saturating max tree depth. False = reference parity (raw x sampling).
    x_whitened: bool = False
    # GP prior mean: None (zero-mean, reference parity), "observed" (per-dim
    # mean of the finite observations; unobserved dims stay 0), a (D,)
    # vector of constants, or a full (n, D) trajectory. The zero-mean prior
    # penalizes signals with a large offset — "observed" removes that cost
    # without inflating the GP variance.
    gp_mean: object = None

    def resolved_dtype(self) -> jnp.dtype:
        return self.dtype if self.dtype is not None else default_dtype()

    @property
    def sigma_provided(self) -> bool:
        return self.sigma is not None and len(np.atleast_1d(self.sigma)) > 0

    @property
    def phi_provided(self) -> bool:
        return self.phi is not None and np.asarray(self.phi).size > 0

    @property
    def sigma_is_fixed(self) -> bool:
        """Sigma is fixed iff BOTH sigma and phi are provided.

        Parity: /root/reference/src/MagiJl.jl:222-243.
        """
        return self.sigma_provided and self.phi_provided
