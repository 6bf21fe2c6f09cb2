"""ChEES-HMC: accelerator-native adaptive Hamiltonian Monte Carlo.

An ALTERNATIVE sampler to NUTS (config.sampler = "chees"), following
Hoffman, Radul & Sountsov (AISTATS 2021, "An Adaptive-MCMC Scheme for
Setting Trajectory Lengths in Hamiltonian Monte Carlo") — the sampler
designed for exactly this hardware situation:

- Every chain runs the SAME number of leapfrog steps per iteration, so C
  chains batch into single (C, ...) tensor ops with zero lockstep waste —
  unlike vmapped NUTS, where the deepest tree gates every chain and the
  while_loop bookkeeping defeats fusion.
- Trajectory length T adapts by Adam ascent on the ChEES criterion
  (Change in the Estimator of the Expected Square): the gradient is
  estimated from per-chain halting statistics and CROSS-CHAIN means — chain
  parallelism is the estimator, which is why the reference's single-chain
  design could never do this.
- Per-iteration trajectory lengths are jittered by a Halton sequence
  (t_i = h_i * T), which both decorrelates and provides the exploration the
  adaptation needs.
- Step size adapts by dual averaging on the cross-chain harmonic-mean
  acceptance; the diagonal metric by Welford over all chains' draws.

The MAGI posterior is the intended target: 8-64 chains on one chip, each
leapfrog step evaluating the fused value-and-grad batched over chains.

Multi-device: chains shard over a 1-D ``Mesh`` (``run_chees(mesh=...)``),
the same axis layout as parallel/chains.py — but unlike NUTS chains, ChEES
chains are COUPLED through the cross-chain adaptation statistics (the
trajectory-criterion gradient, harmonic-mean acceptance, Welford metric,
Oja principal component). Those reductions become ``lax.psum``/``pmean``
collectives over the chain axis — a handful of scalars/(dim,)-vectors per
iteration riding ICI, negligible next to the leapfrog matvecs. Every
chain's randomness comes from its OWN PRNG key, so the sharded run is
bitwise identical to the single-device run in the chain dynamics
(cross-chain statistics match up to reduction order).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .adapt import (
    DualAveragingState,
    da_init,
    da_update,
)

MAX_LEAPFROG = 1000

CHAIN_AXIS = "chains"


def _gmean(x: jnp.ndarray, axis_name: str | None) -> jnp.ndarray:
    """Mean over the (possibly sharded) chain axis: local mean, then pmean
    over the mesh axis — exact for equal shard sizes (enforced)."""
    m = jnp.mean(x, axis=0)
    return lax.pmean(m, axis_name) if axis_name else m


def _gsum(x: jnp.ndarray, axis_name: str | None) -> jnp.ndarray:
    """Sum over the (possibly sharded) chain axis."""
    s = jnp.sum(x, axis=0)
    return lax.psum(s, axis_name) if axis_name else s


def halton(i: jnp.ndarray, base: int = 2) -> jnp.ndarray:
    """Radical-inverse (van der Corput) value of index i in the given base,
    computed branchlessly over 31 bits."""
    i = i.astype(jnp.uint32) + 1
    f = 1.0 / base
    val = jnp.zeros(
        (), jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    )

    def body(k, carry):
        val, f, ii = carry
        digit = ii % base
        val = val + digit * f
        return (val, f / base, ii // base)

    val, _, _ = lax.fori_loop(0, 31, body, (val, f, i))
    return val


class CheesState(NamedTuple):
    qs: jnp.ndarray        # (C, dim)
    logps: jnp.ndarray     # (C,)
    grads: jnp.ndarray     # (C, dim)
    keys: jnp.ndarray      # (C, 2) per-chain PRNG keys (shardable with qs)
    iteration: jnp.ndarray # scalar int32 (replicated; drives the Halton jitter)


class CheesAdaptState(NamedTuple):
    da: DualAveragingState        # step size
    traj_length: jnp.ndarray      # current T (unjittered mean length)
    traj_adam_m: jnp.ndarray
    traj_adam_v: jnp.ndarray
    traj_count: jnp.ndarray
    welford_count: jnp.ndarray
    welford_mean: jnp.ndarray     # (dim,)
    welford_m2: jnp.ndarray       # (dim,)
    inv_mass: jnp.ndarray         # (dim,)
    pc: jnp.ndarray               # (dim,) running principal component (SNAPER)
    # Iterate average of log T (Hoffman et al. 2021 take the averaged — not
    # final — Adam iterate into sampling, exactly like dual averaging's
    # log_eps_avg; using the last noisy iterate was measured to leave 2/3
    # seeds at a collapsed T (results_r3.jsonl config 7: T 1.4-2.1 vs the
    # converged seed's 10.6, R-hat 1.44-1.57).
    log_t_ema: jnp.ndarray        # scalar EMA of log(traj_length)


def chees_init(
    vg_batched: Callable,
    qs: jnp.ndarray,
    key: jnp.ndarray,
    initial_step_size: float,
    initial_traj_length: float | None = None,
) -> Tuple[CheesState, CheesAdaptState]:
    dtype = qs.dtype
    c, dim = qs.shape
    logps, grads = vg_batched(qs)
    state = CheesState(
        qs=qs, logps=logps, grads=grads,
        keys=jax.random.split(key, c), iteration=jnp.int32(0),
    )
    # Start T well above the floor so adaptation explores downward AND
    # upward (tfp-style default: ~32 steps worth).
    t0 = initial_traj_length if initial_traj_length else initial_step_size * 32.0
    adapt = CheesAdaptState(
        da=da_init(jnp.asarray(initial_step_size, dtype)),
        traj_length=jnp.asarray(t0, dtype),
        traj_adam_m=jnp.zeros((), dtype),
        traj_adam_v=jnp.zeros((), dtype),
        traj_count=jnp.zeros((), dtype),
        welford_count=jnp.zeros((), dtype),
        welford_mean=jnp.zeros((dim,), dtype),
        welford_m2=jnp.zeros((dim,), dtype),
        inv_mass=jnp.ones((dim,), dtype),
        pc=jnp.full((dim,), 1.0 / np.sqrt(dim), dtype),
        log_t_ema=jnp.log(jnp.asarray(t0, dtype)),
    )
    return state, adapt


def _leapfrog_batch(vg_batched, qs, ps, grads, eps, inv_mass, n_steps):
    """n_steps batched leapfrog steps for all chains at once."""

    def body(_, carry):
        qs, ps, grads, logps = carry
        ps_half = ps + 0.5 * eps * grads
        qs_new = qs + eps * inv_mass[None, :] * ps_half
        logps_new, grads_new = vg_batched(qs_new)
        ps_new = ps_half + 0.5 * eps * grads_new
        return qs_new, ps_new, grads_new, logps_new

    logps0 = jnp.zeros(qs.shape[0], qs.dtype)
    return lax.fori_loop(
        0, n_steps, body, (qs, ps, grads, logps0)
    )


def chees_transition(
    vg_batched: Callable,
    state: CheesState,
    eps: jnp.ndarray,
    inv_mass: jnp.ndarray,
    traj_length: jnp.ndarray,
    max_leapfrog: int = MAX_LEAPFROG,
    pc: jnp.ndarray | None = None,
    axis_name: str | None = None,
):
    """One jittered-HMC iteration for all chains (shared leapfrog count).

    Returns (new_state, info) where info carries per-chain acceptance and
    the cross-chain trajectory-criterion gradient estimate. With ``pc``
    (a unit vector), the SNAPER criterion is used — squared change of the
    PROJECTION onto the principal component (Sountsov & Hoffman 2021)
    instead of ChEES's squared-norm change, which collapses on multiscale
    targets where the bulk directions' noise swamps the slow direction.

    ``axis_name``: when the chain axis is sharded over a mesh (shard_map),
    the cross-chain statistics (centering means, the criterion-gradient
    numerator/denominator) reduce with psum/pmean over that axis; the
    per-chain dynamics are untouched (each chain uses its own key), so the
    sharded run is bitwise identical to single-device in the chains.
    """
    dtype = state.qs.dtype
    c, dim = state.qs.shape
    ks = jax.vmap(lambda k: jax.random.split(k, 3))(state.keys)  # (C, 3, 2)
    new_keys, k_mom, k_acc = ks[:, 0], ks[:, 1], ks[:, 2]

    # Halton jitter of the trajectory length (shared across chains).
    u = halton(state.iteration).astype(dtype)
    traj = traj_length * u
    n_steps = jnp.clip(
        jnp.ceil(traj / eps).astype(jnp.int32), 1, max_leapfrog
    )
    traj_actual = n_steps.astype(dtype) * eps

    ps = jax.vmap(lambda k: jax.random.normal(k, (dim,), dtype))(
        k_mom
    ) / jnp.sqrt(inv_mass)[None, :]
    h0 = -state.logps + 0.5 * jnp.sum(ps * ps * inv_mass[None, :], axis=1)

    qs_new, ps_new, grads_new, logps_new = _leapfrog_batch(
        vg_batched, state.qs, ps, state.grads, eps, inv_mass, n_steps
    )
    h1 = -logps_new + 0.5 * jnp.sum(ps_new * ps_new * inv_mass[None, :], axis=1)
    delta = h1 - h0
    log_accept = jnp.where(jnp.isnan(delta), -jnp.inf, -delta)
    accept_prob = jnp.exp(jnp.minimum(0.0, log_accept))
    accept_u = jax.vmap(lambda k: jax.random.uniform(k, (), dtype))(k_acc)
    accept = accept_u < accept_prob

    qs_out = jnp.where(accept[:, None], qs_new, state.qs)
    logps_out = jnp.where(accept, logps_new, state.logps)
    grads_out = jnp.where(accept[:, None], grads_new, state.grads)

    # --- ChEES criterion gradient wrt trajectory length ---
    # ChEES = E[ (||q' - E q'||^2 - ||q - E q||^2)^2 ] / 4; its gradient in
    # T is estimated with the per-chain proposal end states and momenta
    # (Hoffman et al. 2021, eq. 8): weight per chain
    #   w_i = a_i * (||q'_c||^2 - ||q_c||^2) * (q'_c . v'_i)
    # with centered q, v' = M^{-1} p', a_i the acceptance probability.
    q_mean = _gmean(state.qs, axis_name)
    qn_mean = _gmean(qs_new, axis_name)
    qc = state.qs - q_mean[None, :]
    qnc = qs_new - qn_mean[None, :]
    vs_new = ps_new * inv_mass[None, :]
    if pc is None:
        # ChEES: squared change of ||q - E q||^2.
        dsq = jnp.sum(qnc * qnc, axis=1) - jnp.sum(qc * qc, axis=1)
        proj = jnp.sum(qnc * vs_new, axis=1)
    else:
        # SNAPER: squared change of the principal-component projection
        # s = (u . (q - E q))^2; d s'/dT = 2 (u.q'_c)(u.v').
        a0 = qc @ pc
        a1 = qnc @ pc
        dsq = a1 * a1 - a0 * a0
        proj = a1 * (vs_new @ pc)
    w = accept_prob * dsq * proj
    denom = _gsum(accept_prob, axis_name) + 1e-6
    chees_grad = _gsum(w, axis_name) / denom  # d criterion / d traj length, up to scale
    # account for the jitter: d t / d T = u
    chees_grad = chees_grad * u

    new_state = CheesState(
        qs=qs_out, logps=logps_out, grads=grads_out, keys=new_keys,
        iteration=state.iteration + 1,
    )
    info = {
        "accept_prob": accept_prob,
        "accepted": accept,
        "num_leapfrog": jnp.full((c,), n_steps, jnp.int32),
        "energy": h0,
        "diverging": delta > 1000.0,
        "chees_grad": chees_grad,
        "traj_actual": traj_actual,
    }
    return new_state, info


def chees_adapt_update(
    adapt: CheesAdaptState,
    qs: jnp.ndarray,
    info,
    target_accept: float,
    eps: jnp.ndarray,
    adam_lr: float = 0.025,
    axis_name: str | None = None,
    t_ema_rate: float = 0.01,
) -> CheesAdaptState:
    """Warmup update: dual averaging on harmonic-mean acceptance, Adam on
    log T along the ChEES gradient, Welford over all chains. With
    ``axis_name`` (sharded chain axis) every cross-chain reduction goes
    through psum/pmean so the adapted quantities equal the single-device
    values up to reduction order."""
    dtype = qs.dtype
    c, dim = qs.shape
    c_glob = (
        lax.psum(jnp.asarray(float(c), dtype), axis_name)
        if axis_name else jnp.asarray(float(c), dtype)
    )
    # harmonic mean of per-chain acceptance (robust to stragglers)
    hmean = 1.0 / _gmean(1.0 / jnp.maximum(info["accept_prob"], 1e-10),
                         axis_name)
    da = da_update(adapt.da, hmean, target_accept)

    # Adam ascent on log T
    g = info["chees_grad"] * adapt.traj_length  # d/d log T
    g = jnp.where(jnp.isfinite(g), g, 0.0)
    b1, b2 = 0.9, 0.95
    t = adapt.traj_count + 1.0
    m = b1 * adapt.traj_adam_m + (1 - b1) * g
    v = b2 * adapt.traj_adam_v + (1 - b2) * g * g
    mhat = m / (1 - b1**t)
    vhat = v / (1 - b2**t)
    # Clip the per-step log-T move: right after an Adam reset (metric
    # refresh) the bias-corrected ratio mhat/sqrt(vhat) is ~+-1 regardless
    # of gradient scale, so a run of one-sided noise can walk T several
    # octaves before v catches up.
    step = jnp.clip(adam_lr * mhat / (jnp.sqrt(vhat) + 1e-8), -0.1, 0.1)
    log_t = jnp.log(adapt.traj_length) + step
    # Keep T within sane bounds relative to eps. The floor of 4 steps guards
    # against the coincident-start death spiral: with all chains at the same
    # point the criterion gradient is pure noise, and once T hits one step
    # proposals stop moving and the gradient stays ~0 forever.
    traj_length = jnp.clip(
        jnp.exp(log_t), 4.0 * eps, eps * MAX_LEAPFROG
    ).astype(dtype)
    log_t_ema = adapt.log_t_ema + t_ema_rate * (
        jnp.log(traj_length) - adapt.log_t_ema
    )

    # Welford over all chains' current draws
    count = adapt.welford_count + c_glob
    delta = qs - adapt.welford_mean[None, :]
    mean = adapt.welford_mean + _gsum(delta, axis_name) / count
    m2 = adapt.welford_m2 + _gsum(delta * (qs - mean[None, :]), axis_name)

    # Oja's rule on the cross-chain batch: one power-iteration-style step
    # of the principal component toward Sigma u (SNAPER's difficult
    # direction). Step size decays like the Welford weight so the estimate
    # settles as the covariance does.
    qc = qs - mean[None, :]
    su = qc.T @ (qc @ adapt.pc)
    if axis_name:
        su = lax.psum(su, axis_name)
    sigma_u = su / c_glob
    eta = 1.0 / jnp.sqrt(t + 10.0)
    pc_new = adapt.pc + eta * sigma_u
    norm = jnp.sqrt(jnp.sum(pc_new * pc_new))
    pc_new = jnp.where(norm > 1e-12, pc_new / norm, adapt.pc)
    pc_new = jnp.where(jnp.all(jnp.isfinite(pc_new)), pc_new, adapt.pc)

    return CheesAdaptState(
        da=da, traj_length=traj_length,
        traj_adam_m=m, traj_adam_v=v, traj_count=t,
        welford_count=count, welford_mean=mean, welford_m2=m2,
        inv_mass=adapt.inv_mass, pc=pc_new, log_t_ema=log_t_ema,
    )


def chees_refresh_mass(adapt: CheesAdaptState) -> CheesAdaptState:
    """Set the inverse metric from accumulated Welford stats and reset them
    (called at window boundaries by the driver)."""
    n = adapt.welford_count
    var = adapt.welford_m2 / jnp.maximum(n - 1.0, 1.0)
    w = n / (n + 5.0)
    inv_mass = w * var + 1e-3 * (1.0 - w)
    inv_mass = jnp.where(n > 1.0, inv_mass, adapt.inv_mass)
    return adapt._replace(
        welford_count=jnp.zeros_like(adapt.welford_count),
        welford_mean=jnp.zeros_like(adapt.welford_mean),
        welford_m2=jnp.zeros_like(adapt.welford_m2),
        inv_mass=inv_mass,
        da=da_init(jnp.exp(adapt.da.log_eps)),
        # T is measured in position space, so a metric change invalidates
        # the criterion-gradient moment estimates; restart the Adam ascent
        # (dual averaging above gets the same treatment).
        traj_adam_m=jnp.zeros_like(adapt.traj_adam_m),
        traj_adam_v=jnp.zeros_like(adapt.traj_adam_v),
        traj_count=jnp.zeros_like(adapt.traj_count),
    )


def chees_checkpoint(
    state: CheesState,
    adapt: CheesAdaptState,
    eps,
    inv_mass,
    traj_length,
    n_samples_drawn: int = 0,
):
    """SamplerCheckpoint for ChEES (same contract as inference/checkpoint.py
    for NUTS; the reference has no checkpointing at all — SURVEY.md §5.4).
    Sampler-specific state rides in ``meta``: the adapted trajectory
    length, the Halton iteration index (so the jitter sequence continues
    where it stopped, not from scratch), and the trajectory-length Adam
    state (m, v, count) so a mid-adaptation resume could continue the
    ascent."""
    from .checkpoint import SamplerCheckpoint

    return SamplerCheckpoint(
        psi=np.asarray(state.qs),
        step_size=np.atleast_1d(np.asarray(eps)),
        inv_mass=np.atleast_2d(np.asarray(inv_mass)),  # (1, dim): shared
        key=np.atleast_2d(np.asarray(state.keys)),     # (C, 2) per chain
        n_samples_drawn=int(n_samples_drawn),
        meta={
            "sampler": "chees",
            "trajectory_length": float(traj_length),
            "iteration": int(state.iteration),
            "traj_adam_m": float(adapt.traj_adam_m),
            "traj_adam_v": float(adapt.traj_adam_v),
            "traj_count": float(adapt.traj_count),
        },
    )


def run_chees_resumed(
    vg: Callable,
    ckpt,
    n_samples: int,
    chunk_size: int = 2000,
    dtype=None,
    checkpoint_path: str | None = None,
    progress: bool = False,
):
    """Continue ChEES sampling from a checkpoint: frozen step size, metric
    and trajectory length (post-warmup semantics), Halton sequence resumed
    at the saved iteration index. Returns (samples (C, S, dim), info,
    new_checkpoint) — the same contract as checkpoint.run_chains_resumed."""
    import logging
    import time as _time

    logger = logging.getLogger(__name__)
    if dtype is None:
        from ..config import default_dtype

        dtype = default_dtype()
    if not (ckpt.meta and ckpt.meta.get("sampler") == "chees"):
        raise ValueError("not a ChEES checkpoint (meta.sampler != 'chees')")

    qs = jnp.asarray(ckpt.psi, dtype)
    c, dim = qs.shape
    eps = jnp.asarray(np.asarray(ckpt.step_size).reshape(()), dtype)
    inv_mass = jnp.asarray(np.asarray(ckpt.inv_mass).reshape(dim), dtype)
    traj = jnp.asarray(ckpt.meta["trajectory_length"], dtype)
    karr = np.asarray(ckpt.key).astype(np.uint32).reshape(-1, 2)
    if karr.shape[0] == c:
        keys = jnp.asarray(karr)               # per-chain keys (current format)
    else:
        # legacy single-key checkpoint: derive per-chain keys from it
        keys = jax.random.split(jnp.asarray(karr[-1]), c)
    vg_batched = jax.vmap(vg)
    logps, grads = vg_batched(qs)
    state = CheesState(
        qs=qs, logps=logps, grads=grads, keys=keys,
        iteration=jnp.int32(int(ckpt.meta.get("iteration", 0))),
    )

    def sample_chunk(state, length):
        def step(state, _):
            new_state, info = chees_transition(
                vg_batched, state, eps, inv_mass, traj
            )
            return new_state, (new_state.qs, new_state.logps, info)

        return lax.scan(step, state, None, length=length)

    from functools import partial

    compiled = {}
    t0 = _time.time()
    qs_parts, lp_parts, acc_parts, leap_parts, div_parts = [], [], [], [], []
    pos = 0
    drawn0 = int(ckpt.n_samples_drawn)
    adapt_stub = CheesAdaptState(
        da=da_init(eps),
        traj_length=traj,
        traj_adam_m=jnp.asarray(ckpt.meta.get("traj_adam_m", 0.0), dtype),
        traj_adam_v=jnp.asarray(ckpt.meta.get("traj_adam_v", 0.0), dtype),
        traj_count=jnp.asarray(ckpt.meta.get("traj_count", 0.0), dtype),
        welford_count=jnp.zeros((), dtype),
        welford_mean=jnp.zeros((dim,), dtype),
        welford_m2=jnp.zeros((dim,), dtype),
        inv_mass=inv_mass,
        pc=jnp.full((dim,), 1.0 / np.sqrt(dim), dtype),
        log_t_ema=jnp.log(traj),
    )
    while pos < n_samples:
        length = min(chunk_size, n_samples - pos)
        if length not in compiled:
            compiled[length] = jax.jit(partial(sample_chunk, length=length))
        state, (qs_c, lps, info) = compiled[length](state)
        qs_parts.append(np.asarray(jnp.swapaxes(qs_c, 0, 1)))
        lp_parts.append(np.asarray(jnp.swapaxes(lps, 0, 1)))
        acc_parts.append(np.asarray(jnp.swapaxes(info["accept_prob"], 0, 1)))
        leap_parts.append(np.asarray(jnp.swapaxes(info["num_leapfrog"], 0, 1)))
        div_parts.append(np.asarray(jnp.swapaxes(info["diverging"], 0, 1)))
        pos += length
        if checkpoint_path:
            from .checkpoint import save_checkpoint

            save_checkpoint(
                checkpoint_path,
                chees_checkpoint(
                    state, adapt_stub, eps, inv_mass, traj,
                    n_samples_drawn=drawn0 + c * pos,
                ),
            )
        if progress:
            logger.info(
                "chees resumed sampling %d/%d (%.1fs)",
                pos, n_samples, _time.time() - t0,
            )

    samples = (
        np.concatenate(qs_parts, axis=1) if qs_parts else np.zeros((c, 0, dim))
    )
    info_out = {
        "lp": np.concatenate(lp_parts, axis=1),
        "accept_prob": np.concatenate(acc_parts, axis=1),
        "num_leapfrog": np.concatenate(leap_parts, axis=1),
        "diverging": np.concatenate(div_parts, axis=1),
        "step_size": np.asarray(eps),
        "inv_mass": np.asarray(inv_mass),
        "trajectory_length": float(traj),
        "final_psi": np.asarray(state.qs),
        "final_key": np.asarray(state.keys),
    }
    new_ckpt = chees_checkpoint(
        state, adapt_stub, eps, inv_mass, traj,
        n_samples_drawn=drawn0 + c * n_samples,
    )
    return samples, info_out, new_ckpt


def run_chees(
    vg: Callable,
    psi0: jnp.ndarray,   # (C, dim)
    key: jnp.ndarray,
    n_samples: int,
    n_adapts: int,
    initial_step_size: float = 0.1,
    target_accept: float = 0.75,
    chunk_size: int = 2000,
    progress: bool = False,
    init_jitter: float = 1e-3,
    initial_traj_length: float | None = None,
    adapt_trajectory: bool = True,
    criterion: str = "snaper",
    checkpoint_path: str | None = None,
    mesh=None,
):
    """Run C ChEES-HMC chains. API mirrors parallel.chains.run_chains
    (the batched axis IS the chain axis). Returns
    (samples (C, S, dim) numpy, info dict).

    ``mesh``: an optional 1-D ``jax.sharding.Mesh`` — chains shard over
    its axis (C must divide by mesh size). The cross-chain adaptation
    statistics reduce with psum/pmean collectives (see module docstring);
    chain dynamics are bitwise independent of the layout because each
    chain carries its own PRNG key.

    ``init_jitter`` disperses chains 1..C-1 around psi0 — the trajectory
    criterion is a CROSS-CHAIN variance statistic and degenerates when all
    chains start coincident. ``criterion`` selects the adaptation signal:
    "snaper" (default; squared change of the principal-component
    projection, robust on multiscale targets — Sountsov & Hoffman 2021) or
    "chees" (squared-norm change, Hoffman et al. 2021 — collapses when
    bulk-direction noise swamps the slow direction, measured on the MAGI
    posterior). ``adapt_trajectory=False`` pins T at
    ``initial_traj_length`` (robust fallback). ``checkpoint_path``: a
    SamplerCheckpoint (.npz) is written after every sampling chunk —
    resume with ``run_chees_resumed`` (frozen eps/metric/trajectory,
    Halton sequence continued)."""
    import logging
    import time as _time

    logger = logging.getLogger(__name__)
    dtype = psi0.dtype
    c, dim = psi0.shape
    n_keep = n_samples - n_adapts
    vg_batched = jax.vmap(vg)

    axis_name = None
    if mesh is not None:
        (axis_name,) = mesh.axis_names
        n_dev = mesh.devices.size
        if c % n_dev != 0:
            raise ValueError(
                f"n_chains={c} must be a multiple of mesh size {n_dev}"
            )

    if init_jitter > 0 and c > 1:
        key, k_jit = jax.random.split(key)
        noise = init_jitter * jax.random.normal(k_jit, psi0.shape, dtype)
        psi0 = psi0.at[1:].add(noise[1:])

    state, adapt = chees_init(
        vg_batched, psi0, key, initial_step_size, initial_traj_length
    )
    t_pinned = float(adapt.traj_length)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        shard = NamedSharding(mesh, P(axis_name))
        repl = NamedSharding(mesh, P())
        state = CheesState(
            qs=jax.device_put(state.qs, shard),
            logps=jax.device_put(state.logps, shard),
            grads=jax.device_put(state.grads, shard),
            keys=jax.device_put(state.keys, shard),
            iteration=jax.device_put(state.iteration, repl),
        )
        adapt = jax.tree.map(lambda x: jax.device_put(x, repl), adapt)
        state_spec = CheesState(
            qs=P(axis_name), logps=P(axis_name), grads=P(axis_name),
            keys=P(axis_name), iteration=P(),
        )
        adapt_spec = jax.tree.map(lambda _: P(), adapt)
        warmup_specs = (
            (state_spec, adapt_spec, P()),
            (state_spec, adapt_spec, P(None, axis_name), P()),
        )
        sample_specs = (
            (state_spec, P(), P(), P()),
            (state_spec, (
                P(None, axis_name, None), P(None, axis_name),
                P(None, axis_name), P(None, axis_name),
                P(None, axis_name),
            )),
        )

        def _wrap(f, specs):
            return jax.jit(jax.shard_map(
                f, mesh=mesh, in_specs=specs[0], out_specs=specs[1],
                check_vma=False,
            ))
    else:
        warmup_specs = sample_specs = None

        def _wrap(f, specs=None):
            return jax.jit(f)

    # Stan-like windows for metric refreshes.
    from .adapt import build_window_schedule

    _, window_end = build_window_schedule(n_adapts)

    if criterion not in ("chees", "snaper"):
        raise ValueError(f"unknown trajectory criterion '{criterion}'")
    use_pc = criterion == "snaper"
    # Iterate-averaging time constant for log T: ~1/8 of warmup, so the
    # sampling-phase T is the settled mean of the final window's iterates
    # rather than the last (noisy) Adam step.
    t_ema_rate = 1.0 / max(n_adapts / 8.0, 50.0)

    def warmup_chunk(state, adapt, we_flags):
        def step(carry, we):
            state, adapt = carry
            eps = jnp.exp(adapt.da.log_eps).astype(dtype)
            new_state, info = chees_transition(
                vg_batched, state, eps, adapt.inv_mass, adapt.traj_length,
                pc=adapt.pc if use_pc else None, axis_name=axis_name,
            )
            adapt = chees_adapt_update(
                adapt, new_state.qs, info, target_accept, eps,
                axis_name=axis_name, t_ema_rate=t_ema_rate,
            )
            if not adapt_trajectory:
                adapt = adapt._replace(
                    traj_length=jnp.asarray(t_pinned, dtype),
                    log_t_ema=jnp.log(jnp.asarray(t_pinned, dtype)),
                )
            adapt = jax.lax.cond(
                we, chees_refresh_mass, lambda a: a, adapt
            )
            return (new_state, adapt), (info["diverging"], adapt.traj_length)

        (state, adapt), (div, ttrace) = lax.scan(step, (state, adapt), we_flags)
        return state, adapt, div, ttrace

    warmup_fn = _wrap(warmup_chunk, warmup_specs)

    def sample_chunk(state, eps, inv_mass, traj_length, length):
        def step(state, _):
            new_state, info = chees_transition(
                vg_batched, state, eps, inv_mass, traj_length,
                axis_name=axis_name,
            )
            return new_state, (
                new_state.qs, new_state.logps, info["accept_prob"],
                info["num_leapfrog"], info["diverging"],
            )

        return lax.scan(step, state, None, length=length)

    t0 = _time.time()
    pos = 0
    ttrace_parts = []
    while pos < n_adapts:
        length = min(chunk_size, n_adapts - pos)
        we = jnp.asarray(window_end[pos : pos + length])
        state, adapt, _, ttrace = warmup_fn(state, adapt, we)
        ttrace_parts.append(np.asarray(ttrace))
        pos += length
        if progress:
            logger.info("chees warmup %d/%d (%.1fs)", pos, n_adapts, _time.time() - t0)

    eps_final = jnp.exp(adapt.da.log_eps_avg).astype(dtype)
    inv_mass_final = adapt.inv_mass
    # Averaged iterate (see CheesAdaptState.log_t_ema), not the last one.
    traj_final = jnp.exp(adapt.log_t_ema).astype(dtype)

    qs_parts, lp_parts, acc_parts, leap_parts, div_parts = [], [], [], [], []
    pos = 0
    sample_chunk_by_len = {}
    while pos < n_keep:
        length = min(chunk_size, n_keep - pos)
        if length not in sample_chunk_by_len:
            from functools import partial

            sample_chunk_by_len[length] = _wrap(
                partial(sample_chunk, length=length), sample_specs
            )
        state, (qs, lps, acc, leap, div) = sample_chunk_by_len[length](
            state, eps_final, inv_mass_final, traj_final
        )
        qs_parts.append(np.asarray(jnp.swapaxes(qs, 0, 1)))   # (C, len, dim)
        lp_parts.append(np.asarray(jnp.swapaxes(lps, 0, 1)))
        acc_parts.append(np.asarray(jnp.swapaxes(acc, 0, 1)))
        leap_parts.append(np.asarray(jnp.swapaxes(leap, 0, 1)))
        div_parts.append(np.asarray(jnp.swapaxes(div, 0, 1)))
        pos += length
        if checkpoint_path:
            from .checkpoint import save_checkpoint

            save_checkpoint(
                checkpoint_path,
                chees_checkpoint(
                    state, adapt, eps_final, inv_mass_final, traj_final,
                    n_samples_drawn=c * pos,
                ),
            )
        if progress:
            logger.info("chees sampling %d/%d (%.1fs)", pos, n_keep, _time.time() - t0)

    samples = np.concatenate(qs_parts, axis=1) if qs_parts else np.zeros((c, 0, dim))
    info_out = {
        "lp": np.concatenate(lp_parts, axis=1),
        "accept_prob": np.concatenate(acc_parts, axis=1),
        "num_leapfrog": np.concatenate(leap_parts, axis=1),
        "tree_depth": np.zeros_like(np.concatenate(leap_parts, axis=1)),
        "diverging": np.concatenate(div_parts, axis=1),
        "energy": np.zeros_like(np.concatenate(lp_parts, axis=1)),
        "step_size": np.asarray(eps_final),
        "inv_mass": np.asarray(inv_mass_final),
        "trajectory_length": float(traj_final),
        "trajectory_warmup_trace": (
            np.concatenate(ttrace_parts) if ttrace_parts else np.zeros((0,))
        ),
        "final_psi": np.asarray(state.qs),
        "final_key": np.asarray(state.keys),
        "warmup_diverging": np.zeros((c, 0)),
    }
    return samples, info_out
