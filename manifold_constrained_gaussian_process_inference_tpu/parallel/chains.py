"""Chain-level parallelism with chunked execution.

The reference is single-chain, single-threaded (SURVEY.md section 2.4). Here
chains are the embarrassingly-parallel axis:

- single device: ``vmap`` batches all chains into one XLA program — the
  (C, dim) leapfrog math becomes batched matvecs on the MXU;
- multi device: ``shard_map`` over a 1-D mesh axis 'chains' places C/devices
  chains on each device; there are NO collectives on the hot path (chains
  never communicate) — results are gathered once at the end, exactly the
  layout SURVEY.md section 5.8 prescribes.

Execution is CHUNKED: the warmup/sampling scans run ``chunk_size``
iterations per device call, with adaptation/sampler state threaded through
host-level Python between calls. Chunking exists for three reasons:
(1) single multi-minute XLA executions have crashed the remote TPU worker
    (observed on a 16k-iteration scan);
(2) per-chunk progress logging — the reference shows AdvancedHMC's progress
    bar (samplers.jl:182), this is our counterpart;
(3) samples stream to host per chunk, bounding device memory.
All chunks share two compiled programs (full chunk + remainder).
"""
from __future__ import annotations

import logging
import time
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..inference.adapt import build_window_schedule
from ..inference.nuts import (
    DenseMetric,
    SampleCarry,
    init_warmup_carry,
    make_sample_step,
    make_sample_step_pooled,
    make_warmup_step,
    make_warmup_step_pooled,
)
from ..inference.nuts_batched import (
    init_warmup_carry_batched,
    make_sample_step_pooled_batched,
    make_warmup_step_pooled_batched,
)

logger = logging.getLogger(__name__)

CHAIN_AXIS = "chains"


def _chunk_lengths(total: int, chunk: int):
    out = []
    done = 0
    while done < total:
        step = min(chunk, total - done)
        out.append(step)
        done += step
    return out


def _window_aligned_chunks(window_end: np.ndarray, chunk: int):
    """Chunk lengths for warmup that end exactly at every adaptation-window
    boundary (so the host can update the pooled metric there), further split
    by ``chunk`` within long windows."""
    bounds = sorted(set(np.where(window_end)[0] + 1) | {len(window_end)})
    out = []
    prev = 0
    for b in bounds:
        if b > prev:
            out.extend(_chunk_lengths(b - prev, chunk))
            prev = b
    return out


def _pooled_dense_metric(
    window_qs, in_win_mask, dim, dtype, prev: DenseMetric, window_div=None
) -> DenseMetric:
    """Cross-chain pooled covariance -> regularized dense M^-1 + Cholesky.

    Pools every in-window draw from ALL chains (C x window samples of a
    (dim,)-vector), shrinks toward the IDENTITY with weight n_s/(n_s+dim)
    — in whitened coordinates the prior scale is ~1 by construction, so
    directions the window has not explored (rank-deficient pooled
    covariance when n_s < dim) keep unit mass instead of collapsing to the
    ridge term — and falls back to the previous metric if the estimate is
    not usable.

    ``window_div`` (same chunk list, (C, L) bool) makes the estimate
    DIVERGENCE-AWARE: a divergent NUTS transition rejects back to (or
    near) its starting point, so divergent iterations contribute repeated,
    boundary-biased positions that skew the pooled covariance toward the
    pathological region that produced them. Those draws are dropped, and
    a window where most draws diverged keeps the previous metric entirely
    (adopting a covariance measured mid-pathology is how one bad window
    poisons the whole run — the round-2 seed-7 902-divergence cluster)."""
    qs = np.concatenate(window_qs, axis=1)          # (C, L, dim) float64
    keep = np.concatenate(in_win_mask)              # (L,)
    qs = qs[:, keep, :]
    if window_div is not None:
        div = np.concatenate(window_div, axis=1)[:, keep].astype(bool)
        frac = float(div.mean()) if div.size else 0.0
        if frac > 0.5:
            logger.warning(
                "pooled dense metric: %.0f%% of window draws diverged; "
                "keeping previous metric.", 100.0 * frac,
            )
            return prev
        if frac > 0.0:
            logger.info(
                "pooled dense metric: dropping %.1f%% divergent window "
                "draws from the estimate.", 100.0 * frac,
            )
        flat = qs[~div].astype(np.float64)          # (n_keep, dim)
    else:
        flat = qs.reshape(-1, dim).astype(np.float64)
    return pooled_dense_metric_from_samples(flat, dim, dtype, prev)


def pooled_dense_metric_from_moments(
    moments, dim: int, dtype, prev: DenseMetric, envelope=None
) -> DenseMetric:
    """DenseMetric from DEVICE-accumulated window moments.

    ``moments`` is a list of per-chunk tuples (cnt, s1, s2, n_win, n_div)
    where cnt/s1/s2 are the divergence-masked count / sum / sum of outer
    products over all chains' in-window draws, and n_win/n_div count
    in-window draws and divergent in-window draws. Reproduces
    _pooled_dense_metric's policies (drop divergent draws; keep the
    previous metric when most of the window diverged) without shipping the
    (C, L, dim) position chunks to the host — ~51 MB per chunk at the
    production shape over the TPU relay, plus a multi-second host np.cov
    on this one-core box, become one (dim, dim) transfer and a device
    einsum."""
    cnt = float(sum(float(m[0]) for m in moments))
    n_win = float(sum(float(m[3]) for m in moments))
    n_div = float(sum(float(m[4]) for m in moments))
    if n_win > 0 and n_div / n_win > 0.5:
        logger.warning(
            "pooled dense metric: %.0f%% of window draws diverged; "
            "keeping previous metric.", 100.0 * n_div / n_win,
        )
        return prev
    if n_div > 0:
        logger.info(
            "pooled dense metric: dropping %.1f%% divergent window "
            "draws from the estimate.", 100.0 * n_div / max(n_win, 1.0),
        )
    if cnt < 5:
        return prev
    s1 = np.sum([np.asarray(m[1], np.float64) for m in moments], axis=0)
    s2 = np.sum([np.asarray(m[2], np.float64) for m in moments], axis=0)
    mean = s1 / cnt
    cov = (s2 - cnt * np.outer(mean, mean)) / (cnt - 1.0)
    return _metric_from_cov(cov, cnt, dim, dtype, prev, envelope)


def pooled_dense_metric_from_samples(
    flat: np.ndarray, dim: int, dtype, prev: DenseMetric
) -> DenseMetric:
    """Core pooled-covariance -> DenseMetric estimator (float64 host)."""
    n_s = flat.shape[0]
    if n_s < 5:
        return prev
    cov = np.cov(flat, rowvar=False)
    return _metric_from_cov(cov, n_s, dim, dtype, prev)


def _metric_from_cov(
    cov: np.ndarray, n_s: float, dim: int, dtype, prev: DenseMetric,
    envelope=None,
) -> DenseMetric:
    """Shared covariance -> regularized DenseMetric tail (f64 host).

    ``envelope`` (CurvatureEnvelope, optional): after shrinkage the
    covariance is folded against every collected divergence-curvature
    probe (PSD-max of precisions), so pocket directions get the mass the
    pooled estimate missed."""
    # Degenerate-window guard: if the chains barely moved this window (all
    # variances far below the ~unit whitened scale), the pooled covariance
    # measures the FREEZE, not the posterior — adopting it shrinks the
    # metric, which shrinks the steps further (measured death spiral on
    # the TPU f32 n=397 workload: eps -> 1e-8). Keep the previous metric
    # and let dual averaging recover instead.
    if float(np.median(np.diag(cov))) < 1e-2:
        logger.warning(
            "pooled dense metric: window variance degenerate (median diag "
            "%.2e); keeping previous metric.", float(np.median(np.diag(cov))),
        )
        return prev
    w = n_s / (n_s + dim)
    reg = w * cov + (1.0 - w) * np.eye(dim)
    if envelope is not None:
        reg = envelope.fold(reg)
    try:
        chol = np.linalg.cholesky(reg)
    except np.linalg.LinAlgError:
        reg = reg + 1e-6 * np.trace(reg) / dim * np.eye(dim)
        try:
            chol = np.linalg.cholesky(reg)
        except np.linalg.LinAlgError:
            return prev
    return DenseMetric(
        minv=jnp.asarray(reg, dtype=dtype),
        chol_minv=jnp.asarray(chol, dtype=dtype),
        # momentum factor L^-T precomputed in f64 (matmul beats TRSM on
        # TPU by ~400x per transition; DenseMetric docstring)
        p_chol=jnp.asarray(np.linalg.inv(chol).T, dtype=dtype),
    )


def _last_div_position(qs, div):
    """Per-chain position associated with the LAST divergent transition
    of a chunk.

    ``qs`` (C, L, dim), ``div`` (C, L) -> ((C, dim), (C,) bool). With
    envelope tracking on, ``qs`` is the per-step divergent-LEAF stack
    (nuts_batched track_div_leaf) — the leapfrog state that actually
    tripped the energy threshold, which is the right CurvatureEnvelope
    probe point (the transition's emitted position rejects back to the
    trajectory START, typically in the healthy bulk — measured on the
    funnel-lite reproducer: start-point probes see identity curvature,
    leaf probes see the pocket). Chains without a divergence return row-0
    garbage under has_div=False. Device-side: one masked argmax + gather,
    (C, dim) transferred instead of the (C, L, dim) chunk."""
    length = qs.shape[1]
    order = jnp.arange(1, length + 1, dtype=qs.dtype)          # 1..L
    idx = jnp.argmax(div.astype(qs.dtype) * order, axis=1)     # (C,)
    q_ld = jnp.take_along_axis(qs, idx[:, None, None], axis=1)[:, 0, :]
    return q_ld, jnp.any(div, axis=1)


class CurvatureEnvelope:
    """Divergence-informed curvature envelope for the pooled dense metric.

    The principled fix for localized sharp-curvature pockets (FN
    theta_b~0.48: P(divergence)=0.64 in-pocket at the bulk-adapted eps —
    docs/BENCHMARKS.md pocket forensics). The pooled sample covariance
    measures the posterior's BULK scales; a pocket whose curvature exceeds
    the pooled precision in some direction makes the leapfrog unstable
    there no matter how well eps fits the bulk. Instead of shrinking eps
    globally (step_jitter's rescue, which taxes every draw), this probes
    the actual Hessian at positions where warmup chains diverged and takes
    the PSD-max of the pooled precision with each probe:

        P_env = max_PSD(P_pool, W' H_pocket W, ...)

    so ONLY the directions where pocket curvature exceeds the pooled
    precision get more mass (smaller M^-1 -> shorter leapfrog moves
    there); every other direction keeps the pooled estimate untouched.
    The metric stays fixed after warmup, so sampling remains a valid
    (reversible, volume-preserving) NUTS chain — this is the
    "re-whitening at adaptation windows" of docs/ROADMAP.md Weak #1,
    folded into the metric (a traced argument) so no program recompiles.

    Host-side, float64. ``hess_fn(z) -> (dim, dim)`` must return the
    NEGATIVE Hessian of the log-density in SAMPLER coordinates (i.e. the
    local precision; solve.py builds it from the exact psi-space Hessian
    conjugated through the whitener, reusing the mode-whitening HVP
    program). Probes are collected during warmup: after each chunk, the
    chain with the most divergences donates its last divergent position —
    at most one probe per chunk, at most ``max_points`` per run, and only
    from chunks where the divergence fraction is below ``max_div_frac``
    (mass divergence means a wrong step size, not a localized pocket) and
    at least one adaptation window has completed (init-buffer divergences
    are step-size-search noise). ``lam_cap`` bounds the per-direction
    precision boost against a garbage Hessian at a pathological point."""

    def __init__(
        self,
        hess_fn,
        logp_fn=None,
        max_points: int = 4,
        lam_cap: float = 1e4,
        max_div_frac: float = 0.05,
        max_boost_dims: int = 16,
        support_drop: float = 50.0,
        boost_margin: float = 16.0,
    ):
        self.hess_fn = hess_fn
        self.logp_fn = logp_fn
        self.max_points = int(max_points)
        self.lam_cap = float(lam_cap)
        self.max_div_frac = float(max_div_frac)
        self.max_boost_dims = int(max_boost_dims)
        self.support_drop = float(support_drop)
        self.boost_margin = float(boost_margin)
        self.points: list = []   # probed z positions, (dim,) float64
        self.precs: list = []    # probed local precisions, (dim, dim) f64
        self.boost_dirs = 0      # diagnostics from the last fold
        self.boost_max = 1.0

    def _probe_point(self, edge: np.ndarray, leaf: np.ndarray) -> np.ndarray:
        """In-support bisection between the divergent step's endpoints.

        The edge alone underestimates the pocket (the step was taken from
        OUTSIDE it); the exploded leaf sits post-explosion where curvature
        is astronomical in every direction (both measured — TreeB.q_div).
        Without a logp_fn the edge is used as-is. Otherwise: walk from the
        edge toward the leaf, halving, until the log-density is within
        ``support_drop`` of the edge's — the farthest still-in-support
        point along the divergent step, i.e. the pocket's interior wall.
        Costs a handful of cheap density evals per probe."""
        if self.logp_fn is None:
            return edge
        d = leaf - edge
        d = np.where(np.isfinite(d), d, 0.0)
        # post-explosion leaves can be numerically enormous; bound the
        # initial segment to a sane multiple of the whitened unit scale
        norm = float(np.linalg.norm(d))
        max_norm = 16.0 * np.sqrt(d.shape[0])
        if norm > max_norm:
            d *= max_norm / norm
        lp_edge = float(self.logp_fn(edge))
        t = 1.0
        for _ in range(10):
            zt = edge + t * d
            lp = float(self.logp_fn(zt))
            if np.isfinite(lp) and lp > lp_edge - self.support_drop:
                return zt
            t *= 0.5
        return edge

    def collect(self, q_lastdiv, has_div, div, past_first_window: bool):
        """Maybe probe ONE divergent position from a finished warmup chunk.

        ``q_lastdiv`` (C, 2, dim): each chain's last divergent step's
        (edge, exploded leaf) endpoints (garbage where ``has_div`` is
        False); ``div`` (C, L): the chunk's divergence flags."""
        if not past_first_window or len(self.points) >= self.max_points:
            return
        div = np.asarray(div, dtype=bool)
        if div.size == 0:
            return
        frac = float(div.mean())
        if frac <= 0.0 or frac > self.max_div_frac:
            return
        counts = div.sum(axis=1)
        i = int(np.argmax(counts))
        if not bool(np.asarray(has_div)[i]):
            return
        pair = np.asarray(q_lastdiv[i], dtype=np.float64)
        try:
            z = self._probe_point(pair[0], pair[1])
            prec = np.asarray(self.hess_fn(z), dtype=np.float64)
        except Exception:
            logger.warning(
                "curvature envelope: Hessian probe failed; skipping point."
            )
            return
        self.points.append(z)
        self.precs.append(0.5 * (prec + prec.T))
        logger.info(
            "curvature envelope: probe %d at a divergent position "
            "(chain %d, %d divergence(s) in chunk, |z| = %.1f).",
            len(self.points), i, int(counts[i]), float(np.linalg.norm(z)),
        )

    def fold(self, cov: np.ndarray) -> np.ndarray:
        """PSD-max the precision of ``cov`` with every collected probe.

        Sequential congruence folds: with P = F F', each probe P_i is
        whitened to S_i = F^-1 P_i F^-T, its eigenvalues clipped to
        [1, lam_cap] (only BOOSTS survive — directions the pooled metric
        already dominates are untouched, as are negative-curvature
        directions of an off-mode Hessian), and the factor updated
        F <- F Q sqrt(clip(lam)). Returns the enveloped covariance
        (P_env^-1), or ``cov`` unchanged when no probe boosts anything."""
        if not self.precs:
            return cov
        try:
            chol = np.linalg.cholesky(cov)
        except np.linalg.LinAlgError:
            logger.warning(
                "curvature envelope: pooled covariance not SPD; skipping "
                "fold."
            )
            return cov
        # P_pool = L^-T L^-1 = F F' with F = L^-T, F^-1 = L'.
        f_inv = chol.T
        f = np.linalg.inv(chol).T
        boost_dirs = 0
        boost_max = 1.0
        for prec in self.precs:
            s = f_inv @ prec @ f_inv.T
            lam, q = np.linalg.eigh(0.5 * (s + s.T))
            # boost_margin: a single probe at the pocket's in-support
            # wall UNDERESTIMATES the interior's peak curvature (measured
            # on the funnel-lite pocket: wall probe 75x vs interior 400x
            # — at the margin-less boost the post-envelope eps re-adapts
            # UP and the divergences return). Overshooting a boosted
            # direction only deepens trees along it; undershooting brings
            # the divergences back — so boosted directions get headroom.
            lam_c = np.where(
                lam > 1.0,
                np.minimum(lam * self.boost_margin, self.lam_cap),
                1.0,
            )
            # A pocket is LOW-dimensional; a probe that wants to boost
            # half the space is measuring a pathological point, not a
            # pocket — keep only its strongest directions (measured on
            # the FN production target: an uncapped 805-direction fold
            # froze every chain at R-hat 3).
            boosted = lam_c > 1.0 + 1e-9
            if int(boosted.sum()) > self.max_boost_dims:
                thresh = np.sort(lam_c)[-self.max_boost_dims]
                lam_c = np.where(lam_c >= thresh, lam_c, 1.0)
            nb = int(np.sum(lam_c > 1.0 + 1e-9))
            if nb == 0:
                continue
            boost_dirs += nb
            boost_max = max(boost_max, float(lam_c.max()))
            f = f @ (q * np.sqrt(lam_c))
            f_inv = (q / np.sqrt(lam_c)).T @ f_inv
        self.boost_dirs, self.boost_max = boost_dirs, boost_max
        if boost_dirs == 0:
            return cov
        cov_env = f_inv.T @ f_inv
        logger.info(
            "curvature envelope: boosted %d direction(s), max precision "
            "ratio %.1f.", boost_dirs, boost_max,
        )
        return 0.5 * (cov_env + cov_env.T)

    def state(self) -> dict:
        """Checkpointable state (warmup-phase SamplerCheckpoint)."""
        return {
            "points": [np.asarray(p) for p in self.points],
            "precs": [np.asarray(p) for p in self.precs],
        }

    def restore(self, st: dict) -> None:
        self.points = [
            np.asarray(p, dtype=np.float64) for p in st.get("points", [])
        ]
        self.precs = [
            np.asarray(p, dtype=np.float64) for p in st.get("precs", [])
        ]


def run_chains(
    vg: Callable,
    psi0: jnp.ndarray,   # (C, dim)
    keys: jnp.ndarray,   # (C, 2) PRNG keys
    n_samples: int,
    n_adapts: int,
    initial_step_size: float = 0.1,
    target_accept: float = 0.8,
    max_depth: int = 10,
    adapt_mass: bool = True,
    mesh: Optional[Mesh] = None,
    chunk_size: int = 1000,
    progress: bool = False,
    checkpoint_path: Optional[str] = None,
    mass_matrix: str = "diag",
    batched_transition: bool = True,
    step_jitter: float = 0.0,
    step_jitter_low: float = 0.4,
    resume_ckpt=None,
    envelope=None,
):
    """Run C NUTS chains (Stan warmup + sampling). Returns
    (samples (C, S, dim) numpy, info dict with a leading chain axis).

    ``resume_ckpt``: a warmup-phase SamplerCheckpoint written by a
    previous (killed) call with the SAME arguments — warmup continues
    from the recorded iteration instead of restarting, bit-identical to
    an uninterrupted run (dense-pooled only; see
    inference/checkpoint.py).

    ``batched_transition`` (dense-pooled only): run the hand-batched NUTS
    transition (inference/nuts_batched.py) instead of
    ``vmap(nuts_transition)`` — same trajectories given the same keys
    (tests/test_nuts_batched.py), materially less per-leaf bookkeeping
    traffic (measured decomposition: benchmarks/lockstep_probe.py).
    Set False to A/B against the vmapped implementation.

    ``checkpoint_path``: when set, a SamplerCheckpoint (positions, adapted
    step sizes/metrics, PRNG keys) is written after every sampling chunk —
    a preempted run resumes with inference.checkpoint.run_chains_resumed
    without repeating warmup.

    ``mass_matrix``: "diag" = per-chain diagonal Welford adaptation (Stan
    parity); "dense-pooled" = one SHARED dense metric estimated from the
    pooled in-window draws of ALL chains at every adaptation-window
    boundary — the chain batch acts as the estimator (a TPU-native
    extension: C chains x window draws give a usable dim x dim estimate no
    single chain could learn; the metric enters the compiled programs as a
    traced argument, so the host-side updates never retrace).

    ``step_jitter`` (dense-pooled only): with this probability per
    POST-WARMUP iteration, the shared frozen step size is scaled by a
    log-uniform multiplier in [``step_jitter_low``, 1] for that one
    iteration. The multiplier sequence is drawn on the host before any
    state is seen (deterministically from ``keys``), so every
    transition still leaves the target invariant — Stan-style step-size
    jitter, biased downward only. Purpose: a chain stuck in a localized
    sharp-curvature pocket (FN theta_b~0.48, measured P(divergence)=0.64
    in-pocket at the bulk-adapted eps — docs/BENCHMARKS.md) escapes at
    the next small-eps iteration instead of freezing for hundreds of
    divergent rejections. The multiplier is SHARED across chains: the
    lockstep tree loop is gated by its deepest chain, so per-chain
    draws would make every batched iteration pay the small-eps
    deep-tree cost, while a shared draw pays it only on the jittered
    fraction (expected extra leapfrogs ~ 1 + p*((1/low-1)/log(1/low)-1)
    ~ 8% at p=1/8, low=0.4).

    ``envelope`` (dense-pooled only): a CurvatureEnvelope — divergent
    warmup positions are probed for their local curvature and PSD-max
    folded into the pooled metric at every adaptation-window boundary,
    so pocket directions get metric mass instead of a global eps tax
    (the principled pocket fix; see the class docstring)."""
    if mass_matrix == "dense-pooled":
        return _run_chains_pooled(
            vg, psi0, keys, n_samples, n_adapts, initial_step_size,
            target_accept, max_depth, mesh, chunk_size, progress,
            checkpoint_path, batched_transition,
            step_jitter, step_jitter_low, resume_ckpt, envelope,
        )
    if mass_matrix != "diag":
        raise ValueError(f"unknown mass_matrix '{mass_matrix}'")
    if envelope is not None:
        raise ValueError(
            "the curvature envelope folds into the dense-pooled metric; "
            "mass_matrix='diag' (Stan parity) does not support it."
        )
    if resume_ckpt is not None:
        raise ValueError(
            "warmup resume is implemented for mass_matrix='dense-pooled' "
            "(the production path); the diag path restarts warmup."
        )
    if step_jitter:
        raise ValueError(
            "step_jitter is implemented for mass_matrix='dense-pooled' "
            "(the production path); the diag path keeps Stan parity."
        )
    n_chains, dim = psi0.shape
    n_keep = n_samples - n_adapts
    dtype = psi0.dtype

    def wrap(f, out_axes=0):
        """vmap over chains, then (optionally) shard over the mesh."""
        batched = jax.vmap(f)
        if mesh is None:
            return jax.jit(batched)
        (axis_name,) = mesh.axis_names
        n_dev = mesh.devices.size
        if n_chains % n_dev != 0:
            raise ValueError(
                f"n_chains={n_chains} must be a multiple of mesh size {n_dev}"
            )
        return jax.jit(
            jax.shard_map(
                batched, mesh=mesh, in_specs=P(axis_name),
                out_specs=P(axis_name), check_vma=False,
            )
        )

    if mesh is not None:
        sharding = NamedSharding(mesh, P(CHAIN_AXIS))
        psi0 = jax.device_put(psi0, sharding)
        keys = jax.device_put(keys, sharding)

    # --- init + warmup ---
    carry = wrap(
        lambda q0, k: init_warmup_carry(vg, q0, k, initial_step_size)
    )(psi0, keys)

    warmup_step = make_warmup_step(vg, target_accept, max_depth, adapt_mass)

    def warmup_chunk(carry, iw, we):
        return jax.lax.scan(warmup_step, carry, (iw, we))

    in_window, window_end = build_window_schedule(n_adapts)
    warmup_div_chunks = []
    pos = 0
    t0 = time.time()
    chunks = _chunk_lengths(n_adapts, chunk_size)
    compiled_warmup = {}
    for li, length in enumerate(chunks):
        iw = jnp.asarray(np.tile(in_window[pos : pos + length], (n_chains, 1)))
        we = jnp.asarray(np.tile(window_end[pos : pos + length], (n_chains, 1)))
        if length not in compiled_warmup:
            compiled_warmup[length] = wrap(warmup_chunk)
        carry, div = compiled_warmup[length](carry, iw, we)
        warmup_div_chunks.append(np.asarray(div))
        pos += length
        if progress:
            logger.info(
                "warmup %d/%d (%.1fs)", pos, n_adapts, time.time() - t0
            )

    eps_final = jnp.exp(carry.da.log_eps_avg).astype(dtype)
    inv_mass_final = carry.inv_mass

    # --- sampling ---
    sample_step = make_sample_step(vg, max_depth)

    def sample_chunk(carry, length):
        return jax.lax.scan(sample_step, carry, None, length=length)

    scarry = SampleCarry(chain=carry.chain, eps=eps_final, inv_mass=inv_mass_final)
    sample_chunks = []
    lp_chunks, acc_chunks, leap_chunks, depth_chunks, div_chunks, e_chunks = (
        [], [], [], [], [], []
    )
    compiled_sample = {}
    pos = 0
    for length in _chunk_lengths(n_keep, chunk_size):
        if length not in compiled_sample:
            compiled_sample[length] = wrap(partial(sample_chunk, length=length))
        scarry, (qs, lps, stats) = compiled_sample[length](scarry)
        sample_chunks.append(np.asarray(qs))
        lp_chunks.append(np.asarray(lps))
        acc_chunks.append(np.asarray(stats.accept_prob))
        leap_chunks.append(np.asarray(stats.num_leapfrog))
        depth_chunks.append(np.asarray(stats.tree_depth))
        div_chunks.append(np.asarray(stats.diverging))
        e_chunks.append(np.asarray(stats.energy))
        pos += length
        if checkpoint_path:
            from ..inference.checkpoint import SamplerCheckpoint, save_checkpoint

            save_checkpoint(
                checkpoint_path,
                SamplerCheckpoint(
                    psi=np.asarray(scarry.chain.q),
                    step_size=np.atleast_1d(np.asarray(eps_final)),
                    inv_mass=np.atleast_2d(np.asarray(inv_mass_final)),
                    key=np.asarray(scarry.chain.key),
                    n_samples_drawn=n_chains * pos,
                ),
            )
        if progress:
            logger.info(
                "sampling %d/%d (%.1fs)", pos, n_keep, time.time() - t0
            )

    cat = lambda parts: (
        np.concatenate(parts, axis=1)
        if parts else np.zeros((n_chains, 0))
    )
    samples = cat(sample_chunks)
    info = {
        "lp": cat(lp_chunks),
        "accept_prob": cat(acc_chunks),
        "num_leapfrog": cat(leap_chunks),
        "tree_depth": cat(depth_chunks),
        "diverging": cat(div_chunks),
        "energy": cat(e_chunks),
        "step_size": np.asarray(eps_final),
        "inv_mass": np.asarray(inv_mass_final),
        "warmup_diverging": cat(warmup_div_chunks),
        "final_psi": np.asarray(scarry.chain.q),
        "final_key": np.asarray(scarry.chain.key),
    }
    return samples, info


def cat_warmup_div(chunks, n_chains):
    """Concatenate per-chunk (C, L) warmup divergence flags (empty-safe)."""
    return (
        np.concatenate(chunks, axis=1)
        if chunks else np.zeros((n_chains, 0), dtype=bool)
    )


def jitter_multipliers(rng, length, prob, low, dtype):
    """Per-iteration shared step-size multipliers for ``step_jitter``:
    1.0 with probability 1-prob, else log-uniform in [low, 1]. ``rng``
    is a host Generator — the sequence is fixed before sampling starts,
    which is what makes jittered NUTS a valid (inhomogeneous) Markov
    chain: eps_t never depends on the current state."""
    m = np.ones(length, dtype=np.float64)
    if prob > 0.0:
        hit = rng.random(length) < prob
        m[hit] = np.exp(np.log(low) * rng.random(int(hit.sum())))
    return jnp.asarray(m, dtype)


def _run_chains_pooled(
    vg, psi0, keys, n_samples, n_adapts, initial_step_size,
    target_accept, max_depth, mesh, chunk_size, progress, checkpoint_path,
    batched_transition=True,
    step_jitter=0.0, step_jitter_low=0.4,
    resume_ckpt=None,
    envelope=None,
):
    """run_chains with the cross-chain pooled dense metric (see run_chains
    docstring). Warmup chunks are aligned to adaptation-window boundaries;
    at each boundary the host pools the window's draws from all chains into
    a regularized dense covariance and swaps it into the (unchanged)
    compiled programs as a traced argument."""
    n_chains, dim = psi0.shape
    n_keep = n_samples - n_adapts
    dtype = psi0.dtype
    vg_b = jax.vmap(vg) if batched_transition else None
    if envelope is not None and not batched_transition:
        raise ValueError(
            "the curvature envelope needs the divergent-leaf positions "
            "only the batched transition tracks (nuts_batched "
            "track_div_leaf); run with batched_transition=True."
        )

    def wrap(f, n_mapped, n_shared=1):
        """vmap over chains for the first n_mapped args; the n_shared
        trailing args (metric, jitter multipliers) are broadcast; then
        (optionally) shard."""
        in_axes = tuple([0] * n_mapped + [None] * n_shared)
        batched = jax.vmap(f, in_axes=in_axes)
        if mesh is None:
            return jax.jit(batched)
        (axis_name,) = mesh.axis_names
        n_dev = mesh.devices.size
        if n_chains % n_dev != 0:
            raise ValueError(
                f"n_chains={n_chains} must be a multiple of mesh size {n_dev}"
            )
        in_specs = tuple([P(axis_name)] * n_mapped + [P()] * n_shared)
        return jax.jit(
            jax.shard_map(
                batched, mesh=mesh, in_specs=in_specs,
                out_specs=P(axis_name), check_vma=False,
            )
        )

    if mesh is not None:
        sharding = NamedSharding(mesh, P(CHAIN_AXIS))
        psi0 = jax.device_put(psi0, sharding)
        keys = jax.device_put(keys, sharding)

    eye = jnp.eye(dim, dtype=dtype)
    metric = DenseMetric(minv=eye, chol_minv=eye, p_chol=eye)

    if batched_transition:
        def init_b(q0s, ks, _m):
            return init_warmup_carry_batched(
                vg_b, q0s, ks, initial_step_size
            )

        if mesh is None:
            init = jax.jit(init_b)
        else:
            init = jax.jit(jax.shard_map(
                init_b, mesh=mesh,
                in_specs=(P(CHAIN_AXIS), P(CHAIN_AXIS), P()),
                out_specs=P(CHAIN_AXIS), check_vma=False,
            ))
    else:
        init = wrap(
            lambda q0, k, _m: init_warmup_carry(vg, q0, k, initial_step_size),
            2,
        )
    carry = init(psi0, keys, metric)

    axis_name = mesh.axis_names[0] if mesh is not None else None
    hi = jax.lax.Precision.HIGHEST

    def _window_moments(qs, div, iw, m_axis):
        """Divergence-masked window moments from a chunk's (C, L, dim)
        positions (device-side; see pooled_dense_metric_from_moments)."""
        iw_f = iw.astype(qs.dtype)
        w = iw_f * (1.0 - div.astype(qs.dtype))               # (C, L)
        qm = qs * w[:, :, None]
        cnt = jnp.sum(w)
        s1 = jnp.sum(qm, axis=(0, 1))
        s2 = jnp.einsum("cld,cle->de", qm, qs, precision=hi)
        n_win = jnp.sum(iw_f)
        n_div = jnp.sum(iw_f * div.astype(qs.dtype))
        moments = (cnt, s1, s2, n_win, n_div)
        if m_axis is not None:
            moments = jax.lax.psum(moments, m_axis)
        return moments

    if batched_transition:
        track_div = envelope is not None
        warmup_step_b = make_warmup_step_pooled_batched(
            vg_b, target_accept, max_depth, track_div_leaf=track_div
        )

        def warmup_chunk_batched(carry, iw, we, m):
            """iw/we are (L,) scalars per step (identical across chains)."""
            carry, ys = jax.lax.scan(
                lambda cc, x: warmup_step_b(cc, x, m), carry, (iw, we)
            )
            qs, div = ys[0], ys[1]
            qs = jnp.swapaxes(qs, 0, 1)                        # (C, L, dim)
            div = div.T                                        # (C, L)
            iw_c = jnp.broadcast_to(iw[None, :], div.shape)
            moments = _window_moments(qs, div, iw_c, axis_name)
            if track_div:
                # gather BOTH endpoints of each chain's last divergent
                # step (edge + exploded leaf); the envelope bisects
                # between them for the in-support probe point
                edge, has_div = _last_div_position(
                    jnp.swapaxes(ys[2][0], 0, 1), div
                )
                leaf, _ = _last_div_position(
                    jnp.swapaxes(ys[2][1], 0, 1), div
                )
                q_ld = jnp.stack([edge, leaf], axis=1)     # (C, 2, dim)
            else:
                q_ld0, has_div = _last_div_position(qs, div)
                q_ld = jnp.stack([q_ld0, q_ld0], axis=1)
            return carry, div, moments, q_ld, has_div

        warmup_in_specs = (P(CHAIN_AXIS), P(), P(), P())
    else:
        warmup_step = make_warmup_step_pooled(vg, target_accept, max_depth)

        def warmup_chunk_batched(carry, iw, we, m):
            """Batched warmup chunk emitting DEVICE-accumulated window
            moments (divergence-masked count / sum / sum of outer products
            over all chains) instead of the raw (C, L, dim) positions —
            the positions stay on device."""

            def scan_one(c, iw1, we1):
                return jax.lax.scan(
                    lambda cc, x: warmup_step(cc, x, m), c, (iw1, we1)
                )

            carry, (qs, div) = jax.vmap(scan_one)(carry, iw, we)
            moments = _window_moments(qs, div, iw, axis_name)
            q_ld0, has_div = _last_div_position(qs, div)
            q_ld = jnp.stack([q_ld0, q_ld0], axis=1)       # (C, 2, dim)
            return carry, div, moments, q_ld, has_div

        warmup_in_specs = (
            P(CHAIN_AXIS), P(CHAIN_AXIS), P(CHAIN_AXIS), P()
        )

    if mesh is None:
        def wrap_warmup(f):
            return jax.jit(f)
    else:
        def wrap_warmup(f):
            return jax.jit(jax.shard_map(
                f, mesh=mesh,
                in_specs=warmup_in_specs,
                out_specs=(
                    P(CHAIN_AXIS), P(CHAIN_AXIS), P(),
                    P(CHAIN_AXIS), P(CHAIN_AXIS),
                ),
                check_vma=False,
            ))

    in_window, window_end = build_window_schedule(n_adapts)
    warmup_div_chunks = []
    window_moments = []
    pos = 0
    n_boundaries = 0
    resume_pos = 0
    if resume_ckpt is not None:
        # Restore the full adaptation state a killed warmup left behind
        # (inference/checkpoint.py SamplerCheckpoint phase="warmup").
        # The carry pytree round-trips via tree_unflatten onto the
        # freshly-initialized carry's structure, so the WarmupCarry /
        # DualAveraging / Welford layouts stay private to nuts.py.
        if getattr(resume_ckpt, "phase", "sampling") != "warmup":
            raise ValueError(
                "resume_ckpt must be a warmup-phase checkpoint; "
                "post-warmup checkpoints resume via run_chains_resumed."
            )
        w = resume_ckpt.warmup
        treedef = jax.tree_util.tree_structure(carry)
        carry = jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(leaf) for leaf in w["carry_leaves"]]
        )
        metric = DenseMetric(
            minv=jnp.asarray(w["metric_minv"]),
            chol_minv=jnp.asarray(w["metric_chol"]),
            p_chol=jnp.asarray(w["metric_pchol"]),
        )
        resume_pos = int(w["pos"])
        n_boundaries = int(np.sum(window_end[:resume_pos]))
        window_moments = [
            tuple(np.asarray(p) for p in m) for m in w["moments"]
        ]
        div0 = np.asarray(w["div"])
        if div0.size:
            warmup_div_chunks.append(div0)
        if envelope is not None and w.get("envelope") is not None:
            envelope.restore(w["envelope"])
    t0 = time.time()
    chunks = _window_aligned_chunks(window_end, chunk_size)
    if resume_pos and resume_pos not in np.cumsum(chunks):
        raise ValueError(
            f"warmup checkpoint position {resume_pos} does not align with "
            f"the chunk schedule for n_adapts={n_adapts}, "
            f"chunk_size={chunk_size} — the resumed call must use the same "
            "arguments as the original run."
        )
    compiled_warmup = {}
    import os as _os

    profile_chunks = _os.environ.get("MAGI_PROFILE_CHUNKS", "") == "1"
    for length in chunks:
        if pos + length <= resume_pos:
            pos += length  # already done by the checkpointed run
            continue
        if batched_transition:
            iw = jnp.asarray(in_window[pos : pos + length])
            we = jnp.asarray(window_end[pos : pos + length])
        else:
            iw = jnp.asarray(
                np.tile(in_window[pos : pos + length], (n_chains, 1))
            )
            we = jnp.asarray(
                np.tile(window_end[pos : pos + length], (n_chains, 1))
            )
        if length not in compiled_warmup:
            compiled_warmup[length] = wrap_warmup(warmup_chunk_batched)
        t_call = time.time()
        carry, div, moments, q_ld, has_div = compiled_warmup[length](
            carry, iw, we, metric
        )
        if profile_chunks:
            jax.block_until_ready(carry)
            logger.warning(
                "warmup chunk %d+%d: device %.2fs",
                pos, length, time.time() - t_call,
            )
        div_np = np.asarray(div)
        warmup_div_chunks.append(div_np)
        window_moments.append(moments)
        if envelope is not None:
            envelope.collect(
                np.asarray(q_ld), np.asarray(has_div), div_np,
                past_first_window=n_boundaries >= 1,
            )
        pos += length
        if window_end[pos - 1]:
            metric = pooled_dense_metric_from_moments(
                window_moments, dim, dtype, metric, envelope
            )
            window_moments = []
            n_boundaries += 1
        if checkpoint_path:
            # Warmup-phase checkpoint: a killed warmup resumes from here
            # instead of restarting (written post-metric-update so the
            # saved metric/moments reflect the boundary state).
            from ..inference.checkpoint import (
                SamplerCheckpoint, save_checkpoint,
            )

            save_checkpoint(
                checkpoint_path,
                SamplerCheckpoint(
                    psi=np.asarray(carry.chain.q),
                    step_size=np.zeros(0),
                    inv_mass=np.asarray(metric.minv),
                    key=np.asarray(carry.chain.key),
                    n_samples_drawn=0,
                    meta={
                        "metric": "dense-pooled",
                        "step_jitter": float(step_jitter),
                        "step_jitter_low": float(step_jitter_low),
                        "n_adapts": int(n_adapts),
                        "chunk_size": int(chunk_size),
                    },
                    phase="warmup",
                    warmup={
                        "pos": pos,
                        "carry_leaves": [
                            np.asarray(leaf)
                            for leaf in jax.tree_util.tree_leaves(carry)
                        ],
                        "metric_minv": np.asarray(metric.minv),
                        "metric_chol": np.asarray(metric.chol_minv),
                        "metric_pchol": np.asarray(metric.p_chol),
                        "moments": [
                            tuple(np.asarray(p) for p in m)
                            for m in window_moments
                        ],
                        "div": cat_warmup_div(warmup_div_chunks, n_chains),
                        "envelope": (
                            envelope.state() if envelope is not None
                            else None
                        ),
                    },
                ),
            )
        if progress:
            logger.info(
                "warmup %d/%d (%.1fs, pooled dense metric)",
                pos, n_adapts, time.time() - t0,
            )

    eps_final = jnp.exp(carry.da.log_eps_avg).astype(dtype)

    if batched_transition:
        sample_step_b = make_sample_step_pooled_batched(vg_b, max_depth)

        def sample_chunk_b(scarry, mults, m, length):
            scarry, (qs, lps, stats) = jax.lax.scan(
                lambda c, x: sample_step_b(c, x, m), scarry, mults,
                length=length,
            )
            # scan emits (L, C, ...); downstream expects chains leading
            qs = jnp.swapaxes(qs, 0, 1)
            lps = lps.T
            stats = jax.tree_util.tree_map(
                lambda a: jnp.swapaxes(a, 0, 1), stats
            )
            return scarry, (qs, lps, stats)

        def wrap_sample(f):
            if mesh is None:
                return jax.jit(f)
            return jax.jit(jax.shard_map(
                f, mesh=mesh, in_specs=(P(CHAIN_AXIS), P(), P()),
                out_specs=P(CHAIN_AXIS), check_vma=False,
            ))

        def make_compiled_sample(length):
            return wrap_sample(partial(sample_chunk_b, length=length))
    else:
        sample_step = make_sample_step_pooled(vg, max_depth)

        def sample_chunk(carry, mults, m, length):
            return jax.lax.scan(
                lambda c, x: sample_step(c, x, m), carry, mults,
                length=length,
            )

        def make_compiled_sample(length):
            # chains mapped; the multiplier sequence and metric shared
            return wrap(partial(sample_chunk, length=length), 1, n_shared=2)

    scarry = SampleCarry(
        chain=carry.chain, eps=eps_final, inv_mass=carry.inv_mass
    )
    # Host RNG for the step-jitter multiplier sequence: seeded from the
    # chain PRNG keys, so the full run (and a same-keys rerun) is
    # deterministic without a new seed parameter.
    jit_rng = np.random.default_rng(
        np.asarray(jax.device_get(keys)).astype(np.uint64).ravel()
    )
    sample_chunks = []
    lp_chunks, acc_chunks, leap_chunks, depth_chunks, div_chunks, e_chunks = (
        [], [], [], [], [], []
    )
    compiled_sample = {}
    pos = 0

    def _materialize(outs):
        qs, lps, stats = outs
        sample_chunks.append(np.asarray(qs))
        lp_chunks.append(np.asarray(lps))
        acc_chunks.append(np.asarray(stats.accept_prob))
        leap_chunks.append(np.asarray(stats.num_leapfrog))
        depth_chunks.append(np.asarray(stats.tree_depth))
        div_chunks.append(np.asarray(stats.diverging))
        e_chunks.append(np.asarray(stats.energy))

    # Transfer/compute overlap: chunk k's outputs are materialized only
    # after chunk k+1 has been DISPATCHED (JAX dispatch is async), so the
    # ~1.5 s/chunk device->host copy of the (C, L, dim) positions rides
    # under the next chunk's ~6 s device execution instead of serializing
    # with it (measured split: MAGI_PROFILE_CHUNKS=1). Checkpointing
    # snapshots the post-chunk carry, which forces materialization.
    pending = None
    for length in _chunk_lengths(n_keep, chunk_size):
        if length not in compiled_sample:
            compiled_sample[length] = make_compiled_sample(length)
        mults = jitter_multipliers(
            jit_rng, length, step_jitter, step_jitter_low, dtype
        )
        t_call = time.time()
        scarry, outs = compiled_sample[length](scarry, mults, metric)
        if profile_chunks:
            jax.block_until_ready(scarry)
            t_dev = time.time()
        if pending is not None:
            _materialize(pending)
        pending = outs
        if profile_chunks:
            logger.warning(
                "sample chunk %d: device %.2fs, prev-chunk transfer %.2fs",
                pos, t_dev - t_call, time.time() - t_dev,
            )
        pos += length
        if checkpoint_path:
            from ..inference.checkpoint import SamplerCheckpoint, save_checkpoint

            _materialize(pending)
            pending = None
            save_checkpoint(
                checkpoint_path,
                SamplerCheckpoint(
                    psi=np.asarray(scarry.chain.q),
                    step_size=np.atleast_1d(np.asarray(eps_final)),
                    inv_mass=np.asarray(metric.minv),
                    key=np.asarray(scarry.chain.key),
                    n_samples_drawn=n_chains * pos,
                    meta={
                        "metric": "dense-pooled",
                        "step_jitter": float(step_jitter),
                        "step_jitter_low": float(step_jitter_low),
                    },
                ),
            )
        if progress:
            logger.info(
                "sampling %d/%d (%.1fs)", pos, n_keep, time.time() - t0
            )
    if pending is not None:
        _materialize(pending)

    cat = lambda parts: (
        np.concatenate(parts, axis=1)
        if parts else np.zeros((n_chains, 0))
    )
    samples = cat(sample_chunks)
    info = {
        "lp": cat(lp_chunks),
        "accept_prob": cat(acc_chunks),
        "num_leapfrog": cat(leap_chunks),
        "tree_depth": cat(depth_chunks),
        "diverging": cat(div_chunks),
        "energy": cat(e_chunks),
        "step_size": np.asarray(eps_final),
        "inv_mass": np.asarray(metric.minv),
        "metric": "dense-pooled",
        "step_jitter": (float(step_jitter), float(step_jitter_low)),
        "warmup_diverging": cat(warmup_div_chunks),
        "final_psi": np.asarray(scarry.chain.q),
        "final_key": np.asarray(scarry.chain.key),
    }
    if envelope is not None:
        info["envelope_points"] = len(envelope.points)
        info["envelope_boost_dirs"] = int(envelope.boost_dirs)
        info["envelope_boost_max"] = float(envelope.boost_max)
    return samples, info


def make_chain_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D device mesh over the chain axis."""
    devices = np.asarray(jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, (CHAIN_AXIS,))
