"""Parallel tempering over a temperature ladder of NUTS chains.

The MAGI posterior is multimodal (sigma-inflated vs data modes; phase-shift
modes in the latent trajectories) and single-temperature chains do not
cross between basins (docs/PARITY.md "measured behavior"). The reference is
single-chain and has no answer. Here the chain axis the framework already
batches becomes a LADDER: chain k samples lp(psi)/T_k with T_0 = 1 < T_1 <
..., all K transitions execute as one vmapped program per iteration, and
adjacent ladder slots attempt state swaps with the standard Metropolis rule

  P(swap i<->j) = min(1, exp((1/T_i - 1/T_j)(lp_j - lp_i)))

so hot chains ferry states across barriers to the cold chain. Only the
T = 1 chain's draws are returned as posterior samples.

Everything is jit-compiled: per-temperature dual averaging + Welford
metrics batch over the ladder, swaps are branchless rolls/selects, and the
whole warmup/sampling runs in the same chunked fashion as
parallel/chains.py. Swap bookkeeping needs the UNTEMPERED log-posterior,
which each transition already computes (value/T scaling happens in a thin
wrapper around the fused value-and-grad — one evaluation per leapfrog step,
same as plain NUTS).
"""
from __future__ import annotations

import logging
import time
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .adapt import (
    build_window_schedule,
    da_init,
    da_restart,
    da_update,
    welford_init,
    welford_update,
    welford_variance_regularized,
)
from .nuts import nuts_transition

logger = logging.getLogger(__name__)

REPLICA_AXIS = "replicas"


def make_replica_mesh(n_devices=None):
    """1-D device mesh over the PT replica axis (each device runs
    pt_replicas/n_devices full temperature ladders; replicas never
    communicate on the hot path — ladder adaptation pools swap counters on
    the host between chunks, exactly like the chain mesh in
    parallel/chains.py)."""
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, (REPLICA_AXIS,))


def geometric_ladder(n_temps: int, t_max: float = 32.0) -> np.ndarray:
    """T_k = t_max^(k/(K-1)): [1, ..., t_max]."""
    if n_temps == 1:
        return np.ones(1)
    return t_max ** (np.arange(n_temps) / (n_temps - 1))


def auto_ladder(n_temps: int, dim: int) -> np.ndarray:
    """Dimension-aware geometric ladder (the warmup STARTING point; the
    ladder then adapts — see ``adapt_ladder``).

    Swap acceptance between adjacent temperatures behaves like
    exp(-(dT/T)^2 dim / 2) for a dim-dimensional target, so the spacing
    must shrink as 1 + sqrt(2/dim) (measured: a [1..64] ladder over 6 rungs
    gets 0.5% swap acceptance at dim=799; this spacing gets tens of
    percent). High barriers in high dimension therefore need MANY rungs —
    prefer increasing n_temps over widening the ladder."""
    spacing = 1.0 + np.sqrt(2.0 / max(dim, 1))
    return spacing ** np.arange(n_temps)


def adapt_ladder(
    inv_temps: np.ndarray,
    n_acc: np.ndarray,
    n_try: np.ndarray,
    min_tries: int = 10,
) -> np.ndarray:
    """Re-place the interior rungs so every adjacent pair carries an equal
    share of the communication barrier (Syed et al. 2021, "Non-reversible
    parallel tempering": the round-trip rate of the deterministic even-odd
    scheme is maximized when the per-pair rejection is equidistributed).

    The cumulative barrier Lambda is estimated from the measured per-pair
    rejection rates r_k by trapezoid accumulation over the current ladder;
    new rungs are placed (in log inverse temperature) at equal Lambda
    levels. Endpoints stay fixed. Pairs with fewer than ``min_tries``
    attempts leave the ladder unchanged.
    """
    k = len(inv_temps)
    if k < 3:
        return inv_temps
    tries = np.asarray(n_try, dtype=np.float64)[: k - 1]
    acc = np.asarray(n_acc, dtype=np.float64)[: k - 1]
    if np.any(tries < min_tries):
        return inv_temps
    r = 1.0 - acc / tries
    # Keep the cumulative barrier strictly increasing so interpolation is
    # well-posed; the clip also caps the correction per update (stability).
    r = np.clip(r, 0.02, 0.98)
    lam = np.concatenate([[0.0], np.cumsum(r)])
    logb = np.log(np.asarray(inv_temps, dtype=np.float64))  # decreasing
    targets = np.linspace(0.0, lam[-1], k)
    new_logb = np.interp(targets, lam, logb)
    new_logb[0], new_logb[-1] = logb[0], logb[-1]
    return np.exp(new_logb)


class PTCarry(NamedTuple):
    qs: jnp.ndarray        # (K, dim)
    lp: jnp.ndarray        # (K,) UNTEMPERED log-posterior
    grads: jnp.ndarray     # (K, dim) untempered gradients
    key: jnp.ndarray
    da: object             # batched DualAveragingState (K,)
    welford: object        # batched WelfordState
    inv_mass: jnp.ndarray  # (K, dim)
    inv_temps: jnp.ndarray # (K,) dynamic: the ladder adapts during warmup
    n_swap_accept: jnp.ndarray  # (K,) per-pair counts at the LEFT index
    n_swap_try: jnp.ndarray     # (K,)
    iteration: jnp.ndarray


def _make_pt_step(vg: Callable, k_temps: int, target_accept: float,
                  max_depth: int, adapt: bool, pooled: bool = False,
                  emit_all: bool = False):
    """One PT iteration: K tempered NUTS transitions + one swap sweep
    (deterministic even-odd — the non-reversible DEO scheme).

    ``pooled``: the step takes a per-rung DenseMetric stack ((K, dim, dim)
    leaves) as a third, traced argument — the host updates it between
    window-aligned chunks (cross-replica pooled estimation) with no
    retrace; in-scan metric adaptation is disabled. ``emit_all`` makes the
    step emit ALL rung positions (the pooling input) instead of the cold
    rung's."""

    def transition_one(q, lp_b, g_b, key, eps, im, inv_t):
        def vg_t(qq):
            v, g = vg(qq)
            return v * inv_t, g * inv_t

        q2, lp_t, g_t, stats = nuts_transition(
            vg_t, q, lp_b * inv_t, g_b * inv_t, key, eps, im,
            max_depth=max_depth,
        )
        return q2, lp_t / inv_t, g_t / inv_t, stats

    v_transition = jax.vmap(transition_one)

    def pt_step(carry: PTCarry, xs, metric=None):
        in_win, win_end = xs if adapt else (None, None)
        inv_temps = carry.inv_temps
        key, k_step, k_swap = jax.random.split(carry.key, 3)
        step_keys = jax.random.split(k_step, k_temps)
        eps = jnp.exp(carry.da.log_eps if adapt else carry.da.log_eps_avg)
        eps = eps.astype(carry.qs.dtype)

        qs, lp, grads, stats = v_transition(
            carry.qs, carry.lp, carry.grads, step_keys, eps,
            metric if pooled else carry.inv_mass, inv_temps,
        )

        # --- swap sweep: even pairs on even iterations, odd pairs on odd ---
        start = (carry.iteration % 2).astype(jnp.int32)
        idx = jnp.arange(k_temps)
        is_left = (idx % 2) == (start % 2)
        partner = jnp.where(is_left, idx + 1, idx - 1)
        valid = (partner >= 0) & (partner < k_temps)
        partner = jnp.clip(partner, 0, k_temps - 1)

        lp_partner = lp[partner]
        delta = (inv_temps - inv_temps[partner]) * (lp_partner - lp)
        u = jax.random.uniform(k_swap, (k_temps,), carry.qs.dtype)
        u_pair = jnp.where(is_left, u, u[partner])  # shared per pair
        do_swap = valid & (jnp.log(u_pair) < delta)

        qs = jnp.where(do_swap[:, None], qs[partner], qs)
        grads = jnp.where(do_swap[:, None], grads[partner], grads)
        lp = jnp.where(do_swap, lp_partner, lp)
        # Divergence flags travel WITH the positions: the emitted qs are
        # post-swap, so the flag consumed by the pooled-metric filter (and
        # any per-rung diagnostic) must be permuted identically or a swap
        # would drop the healthy partner draw and keep the divergent-stuck
        # one. Both pair members swap together, so totals are preserved.
        diverging = jnp.where(do_swap, stats.diverging[partner],
                              stats.diverging)

        # Per-pair bookkeeping at the pair's left index (last slot unused).
        n_try = carry.n_swap_try + (valid & is_left).astype(jnp.int32)
        n_acc = carry.n_swap_accept + (do_swap & is_left).astype(jnp.int32)

        # --- adaptation (warmup only) ---
        da, welford, inv_mass = carry.da, carry.welford, carry.inv_mass
        if adapt:
            da = jax.vmap(
                lambda d, a: da_update(d, a, target_accept)
            )(da, stats.accept_prob)
            if not pooled:
                updated = jax.vmap(welford_update)(welford, qs)
                welford = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(in_win, a, b), updated, welford
                )
                new_inv_mass = jax.vmap(welford_variance_regularized)(welford)
                inv_mass = jnp.where(win_end, new_inv_mass, inv_mass)
                dim = qs.shape[1]
                fresh = jax.vmap(lambda _: welford_init(dim, qs.dtype))(
                    jnp.arange(k_temps)
                )
                welford = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(win_end, a, b), fresh, welford
                )
            da = jax.tree_util.tree_map(
                lambda a, b: jnp.where(win_end, a, b),
                jax.vmap(da_restart)(da), da,
            )

        new = PTCarry(
            qs=qs, lp=lp, grads=grads, key=key, da=da, welford=welford,
            inv_mass=inv_mass, inv_temps=inv_temps,
            n_swap_accept=n_acc, n_swap_try=n_try,
            iteration=carry.iteration + 1,
        )
        # NOTE on ordering conventions: accept_prob / tree_depth /
        # num_leapfrog are RUNG-ordered (pre-swap) by design — row 0
        # describes the rung-0 NUTS transition, the right convention for
        # step-size health. `diverging` is swap-PERMUTED so the flag
        # travels with the emitted positions (a diverged draw stays
        # flagged wherever the swap sends it).
        out = (
            qs if emit_all else qs[0],
            lp[0], diverging, stats.num_leapfrog,
            stats.accept_prob, stats.tree_depth,
        )
        return new, out

    return pt_step


def _reset_counters(carry: PTCarry) -> PTCarry:
    z = jnp.zeros_like(carry.n_swap_try)
    return carry._replace(n_swap_accept=z, n_swap_try=z)


def run_parallel_tempering(
    vg: Callable,
    psi0: jnp.ndarray,   # (dim,) — all ladder slots start here
    key: jnp.ndarray,
    n_samples: int,
    n_adapts: int,
    temperatures=None,
    n_temps: int = 8,
    max_temp=None,
    initial_step_size: float = 0.1,
    target_accept: float = 0.8,
    max_depth: int = 10,
    chunk_size: int = 1000,
    progress: bool = False,
    ladder_adapt: bool = True,
    checkpoint_path=None,
    n_replicas: int = 1,
    mass_matrix: str = "diag",
    mesh=None,
):
    """PT-NUTS. Returns (samples from the T=1 chain(s), info): samples are
    (S, dim) when ``n_replicas == 1`` (default), else (R, S, dim) — R
    INDEPENDENT ladders vmapped into one program (replica axis x ladder
    axis on device). Replication multiplies ESS near-linearly at sublinear
    wall-time cost (the per-rung problem underutilizes the chip) and gives
    independent cold chains for split-R-hat.

    ``mesh``: a 1-D ``jax.sharding.Mesh`` (see ``make_replica_mesh``)
    shards the REPLICA axis across devices via shard_map — replicas are
    independent ladders, so the hot path has zero collectives; host-side
    ladder adaptation and pooled-metric estimation already pool across
    replicas between chunks and work unchanged. Requires
    ``n_replicas % mesh.devices.size == 0``.

    The ladder SPACING adapts during the first ~3/4 of warmup
    (``adapt_ladder``: equidistributed per-pair rejection, endpoints
    fixed, swap statistics POOLED across replicas — all replicas share one
    ladder); ``ladder_adapt=False`` keeps the initial ladder. When
    ``checkpoint_path`` is set, a resumable PT checkpoint (.npz) is written
    after every sampling chunk (see ``pt_checkpoint``/
    ``run_parallel_tempering_resumed``).
    """
    dtype = psi0.dtype
    dim = psi0.shape[-1]
    n_rep = int(n_replicas)
    n_keep = n_samples - n_adapts
    if temperatures is None:
        temperatures = (
            geometric_ladder(n_temps, max_temp)
            if max_temp is not None
            else auto_ladder(n_temps, dim)
        )
    temperatures = np.asarray(temperatures, dtype=np.float64)
    k_temps = len(temperatures)

    psi0s = (
        jnp.broadcast_to(psi0, (n_rep, dim)) if psi0.ndim == 1 else psi0
    )
    lp0s, g0s = jax.vmap(vg)(psi0s)
    keys = jax.random.split(key, n_rep)
    inv_temps0 = jnp.asarray(1.0 / temperatures, dtype)

    def one_replica_carry(psi, lp0, g0, k):
        return PTCarry(
            qs=jnp.tile(psi[None], (k_temps, 1)),
            lp=jnp.tile(lp0[None], (k_temps,)),
            grads=jnp.tile(g0[None], (k_temps, 1)),
            key=k,
            da=jax.vmap(
                lambda _: da_init(jnp.asarray(initial_step_size, dtype))
            )(jnp.arange(k_temps)),
            welford=jax.vmap(lambda _: welford_init(dim, dtype))(
                jnp.arange(k_temps)
            ),
            inv_mass=jnp.ones((k_temps, dim), dtype),
            inv_temps=inv_temps0,
            n_swap_accept=jnp.zeros((k_temps,), jnp.int32),
            n_swap_try=jnp.zeros((k_temps,), jnp.int32),
            iteration=jnp.int32(0),
        )

    # Leading replica axis on every carry leaf; each step is the one-ladder
    # PT step vmapped over it (per-iteration adaptation flags are shared).
    carry = jax.vmap(one_replica_carry)(psi0s, lp0s, g0s, keys)

    rep_axis = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        (rep_axis,) = mesh.axis_names
        n_dev = mesh.devices.size
        if n_rep % n_dev != 0:
            raise ValueError(
                f"n_replicas={n_rep} must be a multiple of mesh size {n_dev}"
            )
        carry = jax.device_put(carry, NamedSharding(mesh, P(rep_axis)))

    pooled = mass_matrix == "dense-pooled"
    if mass_matrix not in ("diag", "dense-pooled"):
        raise ValueError(f"unknown mass_matrix '{mass_matrix}'")
    metric = None
    if pooled:
        from .nuts import DenseMetric

        eye = jnp.broadcast_to(
            jnp.eye(dim, dtype=dtype), (k_temps, dim, dim)
        )
        metric = DenseMetric(minv=eye, chol_minv=eye, p_chol=eye)

    in_window, window_end = build_window_schedule(n_adapts)
    warm_step = jax.vmap(
        _make_pt_step(
            vg, k_temps, target_accept, max_depth, True,
            pooled=pooled, emit_all=pooled,
        ),
        in_axes=((0, None, None) if pooled else (0, None)),
    )
    sample_step = jax.vmap(
        _make_pt_step(
            vg, k_temps, target_accept, max_depth, False, pooled=pooled
        ),
        in_axes=((0, None, None) if pooled else (0, None)),
    )

    compiled = {}

    def _compile(step, with_metric):
        """Jit (and, with a mesh, shard_map over the replica axis) the
        chunked scan. Inside shard_map the SAME vmapped step runs on the
        local replica shard; flags and the pooled metric are replicated
        (P()); carry leaves shard on their leading replica axis and the
        per-iteration emissions on axis 1 (scan stacks time first)."""
        if with_metric:
            body = lambda c, f, m: lax.scan(
                lambda cc, x: step(cc, x, m), c, f
            )
        else:
            body = lambda c, f: lax.scan(step, c, f)
        if mesh is not None:
            from jax.sharding import PartitionSpec as P

            in_specs = (
                (P(rep_axis), P(), P()) if with_metric
                else (P(rep_axis), P())
            )
            body = jax.shard_map(
                body, mesh=mesh, in_specs=in_specs,
                out_specs=(P(rep_axis), P(None, rep_axis)),
                check_vma=False,
            )
        return jax.jit(body)

    def run_chunk(carry, step, flags, length, tag, metric_=None):
        key_ = (tag, length)
        if key_ not in compiled:
            compiled[key_] = _compile(step, pooled)
        if pooled:
            return compiled[key_](carry, flags, metric_)
        return compiled[key_](carry, flags)

    t0 = time.time()
    pos = 0
    warm_div = []
    # Ladder adaptation happens at warmup sub-chunk boundaries and freezes
    # for the last quarter of warmup (metric/step-size settle on the final
    # ladder). Sub-chunks are sized so ~8 updates happen even when
    # chunk_size exceeds the warmup length; each update needs >= ~10 tries
    # per pair to act (adapt_ladder min_tries), i.e. >= ~20 iterations.
    ladder_freeze_at = int(0.75 * n_adapts)
    adapt_seg = max(50, n_adapts // 10) if ladder_adapt else n_adapts
    we_bounds = np.where(window_end)[0] + 1  # pooled-metric update points
    win_qs, win_mask, win_div = [], [], []
    while pos < n_adapts:
        limit = ladder_freeze_at if pos < ladder_freeze_at else n_adapts
        length = min(chunk_size, adapt_seg, limit - pos)
        if pooled:
            nxt = we_bounds[we_bounds > pos]
            if nxt.size:
                length = min(length, int(nxt[0]) - pos)
        flags = (
            jnp.asarray(in_window[pos : pos + length]),
            jnp.asarray(window_end[pos : pos + length]),
        )
        carry, (q0s, lp0s_, div, _, _, _) = run_chunk(
            carry, warm_step, flags, length, "w", metric
        )
        warm_div.append(np.asarray(div))
        if pooled:
            # q0s is (L, R, K, dim) in pooled warmup (emit_all).
            win_qs.append(np.asarray(q0s))
            win_mask.append(in_window[pos : pos + length])
            win_div.append(np.asarray(div))  # (L, R, K)
        pos += length
        if pooled and window_end[pos - 1]:
            from ..parallel.chains import pooled_dense_metric_from_samples
            from .nuts import DenseMetric

            buf = np.concatenate(win_qs, axis=0)        # (Lw, R, K, dim)
            keep = np.concatenate(win_mask)
            buf = buf[keep]
            dbuf = np.concatenate(win_div, axis=0)[keep].astype(bool)
            prev_minv = np.asarray(metric.minv)
            minvs, chols, pchols = [], [], []
            for k_i in range(k_temps):
                # Divergence-aware pooling, same rationale as
                # chains._pooled_dense_metric: divergent transitions emit
                # repeated boundary-biased positions — drop them, and keep
                # the previous rung metric if most of the window diverged.
                d_k = dbuf[:, :, k_i]                   # (Lw', R)
                prev_chol64 = np.linalg.cholesky(
                    np.asarray(prev_minv[k_i], dtype=np.float64)
                )
                prev_k = DenseMetric(
                    minv=jnp.asarray(prev_minv[k_i], dtype),
                    chol_minv=jnp.asarray(prev_chol64, dtype),
                    p_chol=jnp.asarray(
                        np.linalg.inv(prev_chol64).T, dtype
                    ),
                )
                frac = float(d_k.mean()) if d_k.size else 0.0
                if frac > 0.5:
                    logger.warning(
                        "PT pooled metric rung %d: %.0f%% of window draws "
                        "diverged; keeping previous metric.",
                        k_i, 100.0 * frac,
                    )
                    m_k = prev_k
                else:
                    flat = (
                        buf[:, :, k_i, :][~d_k].astype(np.float64)
                    )
                    m_k = pooled_dense_metric_from_samples(
                        flat, dim, dtype, prev_k
                    )
                minvs.append(m_k.minv)
                chols.append(m_k.chol_minv)
                pchols.append(m_k.p_chol)
            metric = DenseMetric(
                minv=jnp.stack(minvs), chol_minv=jnp.stack(chols),
                p_chol=jnp.stack(pchols),
            )
            win_qs, win_mask, win_div = [], [], []
        if ladder_adapt and pos <= ladder_freeze_at:
            old = np.asarray(carry.inv_temps, dtype=np.float64)[0]
            new = adapt_ladder(
                old,
                np.asarray(carry.n_swap_accept).sum(axis=0),
                np.asarray(carry.n_swap_try).sum(axis=0),
            )
            if not np.allclose(new, old):
                carry = _reset_counters(
                    carry._replace(
                        inv_temps=jnp.tile(
                            jnp.asarray(new, dtype)[None], (n_rep, 1)
                        )
                    )
                )
                if progress:
                    logger.info(
                        "PT ladder adapted: T = %s",
                        np.round(1.0 / new, 3),
                    )
        if progress:
            logger.info("PT warmup %d/%d (%.1fs)", pos, n_adapts, time.time() - t0)

    # Report swap statistics for the sampling phase only.
    carry = _reset_counters(carry)
    temperatures = 1.0 / np.asarray(carry.inv_temps, dtype=np.float64)[0]

    samples, lps, divs, leaps = [], [], [], []
    accs, depths = [], []
    pos = 0
    while pos < n_keep:
        length = min(chunk_size, n_keep - pos)
        flags = (jnp.zeros(length, bool), jnp.zeros(length, bool))
        carry, (qs, lp0s_, div, leap, acc, dep) = run_chunk(
            carry, sample_step, flags, length, "s", metric
        )
        samples.append(np.asarray(qs))
        lps.append(np.asarray(lp0s_))
        divs.append(np.asarray(div))
        leaps.append(np.asarray(leap))
        accs.append(np.asarray(acc))
        depths.append(np.asarray(dep))
        pos += length
        if checkpoint_path:
            save_pt_checkpoint(
                checkpoint_path,
                pt_checkpoint(carry, n_samples_drawn=pos, metric=metric),
            )
        if progress:
            logger.info("PT sampling %d/%d (%.1fs)", pos, n_keep, time.time() - t0)

    info = _pt_info(carry, temperatures, lps, divs, leaps, k_temps,
                    accs=accs, depths=depths)
    if pooled:
        info["metric"] = "dense-pooled"
        info["inv_mass"] = np.asarray(metric.minv)  # (K, dim, dim)
    out = (
        np.concatenate(samples)
        if samples else np.zeros((0, n_rep, dim))
    )  # (S, R, dim)
    if n_rep == 1:
        return out[:, 0], info
    return out.transpose(1, 0, 2), info  # (R, S, dim)


def _squeeze_rep(a):
    """Drop a leading replica axis of size 1 (single-ladder compatibility)."""
    a = np.asarray(a)
    return a[0] if a.ndim >= 1 and a.shape[0] == 1 else a


def _pt_info(carry, temperatures, lps, divs, leaps, k_temps,
             accs=None, depths=None):
    # Counters carry a leading replica axis; swap statistics pool over it.
    acc = np.asarray(carry.n_swap_accept, dtype=np.float64).sum(axis=0)[
        : k_temps - 1
    ]
    tries = np.asarray(carry.n_swap_try, dtype=np.float64).sum(axis=0)[
        : k_temps - 1
    ]
    per_pair = acc / np.maximum(tries, 1.0)
    swap_rate = float(acc.sum()) / max(float(tries.sum()), 1.0)
    n_rep = np.asarray(carry.lp).shape[0]
    # Per-step outputs stack as (S, R, ...); collapse the replica axis for
    # the single-ladder case so shapes match the pre-replica contract.
    cat = (lambda xs, empty: np.concatenate(xs) if xs else empty)
    lp = cat(lps, np.zeros((0, n_rep)))
    div = cat(divs, np.zeros((0, n_rep, k_temps)))
    leap = cat(leaps, np.zeros((0, n_rep, k_temps)))
    # Real per-rung NUTS health stats (VERDICT r3 era artifacts carried
    # fabricated accept=1 / depth=0 defaults from solve_magi; PT now
    # reports the sampled-phase per-rung values, shaped like num_leapfrog).
    acc_s = cat(accs or [], np.zeros((0, n_rep, k_temps)))
    dep_s = cat(depths or [], np.zeros((0, n_rep, k_temps)))
    if n_rep == 1:
        lp, div, leap = lp[:, 0], div[:, 0], leap[:, 0]
        acc_s, dep_s = acc_s[:, 0], dep_s[:, 0]
    return {
        "lp": lp,
        "diverging": div,
        "num_leapfrog": leap,
        "accept_prob": acc_s,
        "tree_depth": dep_s,
        "swap_acceptance": swap_rate,
        "swap_acceptance_per_pair": per_pair,
        "temperatures": temperatures,
        "step_size": _squeeze_rep(np.exp(np.asarray(carry.da.log_eps_avg))),
        "inv_mass": _squeeze_rep(carry.inv_mass),
        "final_psi": _squeeze_rep(carry.qs),
        "final_key": _squeeze_rep(carry.key),
    }


# ---------------------------------------------------------------------------
# Checkpoint / resume (post-warmup; mirrors inference/checkpoint.py for NUTS)
# ---------------------------------------------------------------------------

def pt_checkpoint(carry: PTCarry, n_samples_drawn: int = 0, metric=None) -> dict:
    """Everything needed to continue PT sampling: full-ladder positions and
    untempered lp, per-rung step sizes/metrics, the adapted ladder, swap
    counters, sweep parity, and the PRNG key. Single-ladder checkpoints
    store ladder-shaped arrays (back-compatible); replicated runs store a
    leading replica axis (qs.ndim == 3). A pooled dense metric (shared
    across replicas) is stored as metric_minv (K, dim, dim)."""
    sq = _squeeze_rep
    if metric is not None:
        return dict(
            metric_minv=np.asarray(metric.minv),
            **pt_checkpoint(carry, n_samples_drawn),
        )
    return dict(
        qs=sq(carry.qs),
        lp=sq(carry.lp),
        eps=sq(np.exp(np.asarray(carry.da.log_eps_avg))),
        inv_mass=sq(carry.inv_mass),
        inv_temps=sq(carry.inv_temps),
        n_swap_accept=sq(carry.n_swap_accept),
        n_swap_try=sq(carry.n_swap_try),
        iteration=sq(carry.iteration),
        key=sq(carry.key),
        n_samples_drawn=np.asarray(n_samples_drawn),
    )


def save_pt_checkpoint(path: str, ckpt: dict) -> None:
    np.savez(path, **ckpt)


def load_pt_checkpoint(path: str) -> dict:
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def run_parallel_tempering_resumed(
    vg: Callable,
    ckpt: dict,
    n_samples: int,
    target_accept: float = 0.8,
    max_depth: int = 10,
    chunk_size: int = 1000,
    dtype=None,
    checkpoint_path=None,
    progress: bool = False,
):
    """Continue PT sampling from a checkpoint: frozen ladder, step sizes and
    metrics (post-warmup semantics). Returns (samples (S, dim) from the
    T=1 chain, info, new_checkpoint)."""
    if dtype is None:
        from ..config import default_dtype

        dtype = default_dtype()
    # Single-ladder checkpoints store (K, dim); replicated runs (R, K, dim).
    qs_np = np.asarray(ckpt["qs"])
    n_rep = qs_np.shape[0] if qs_np.ndim == 3 else 1
    qs = jnp.asarray(qs_np.reshape(n_rep, *qs_np.shape[-2:]), dtype)
    _, k_temps, dim = qs.shape
    eps = jnp.asarray(
        np.asarray(ckpt["eps"]).reshape(n_rep, k_temps), dtype
    )
    # Positions round-trip through the .npz at storage precision; recompute
    # lp/grads instead of trusting saved lp against re-cast positions.
    lp, grads = jax.vmap(jax.vmap(vg))(qs)

    carry = PTCarry(
        qs=qs,
        lp=lp,
        grads=grads,
        key=jnp.asarray(
            np.asarray(ckpt["key"]).astype(np.uint32).reshape(n_rep, -1)
        ),
        da=jax.vmap(jax.vmap(da_init))(eps),
        welford=jax.vmap(
            lambda _: jax.vmap(lambda __: welford_init(dim, dtype))(
                jnp.arange(k_temps)
            )
        )(jnp.arange(n_rep)),
        inv_mass=jnp.asarray(
            np.asarray(ckpt["inv_mass"]).reshape(n_rep, k_temps, dim), dtype
        ),
        inv_temps=jnp.asarray(
            np.asarray(ckpt["inv_temps"]).reshape(n_rep, k_temps), dtype
        ),
        n_swap_accept=jnp.asarray(
            np.asarray(ckpt["n_swap_accept"]).reshape(n_rep, k_temps),
            jnp.int32,
        ),
        n_swap_try=jnp.asarray(
            np.asarray(ckpt["n_swap_try"]).reshape(n_rep, k_temps), jnp.int32
        ),
        iteration=jnp.asarray(
            np.asarray(ckpt["iteration"]).reshape(n_rep), jnp.int32
        ),
    )
    temperatures = 1.0 / np.asarray(
        np.asarray(ckpt["inv_temps"], dtype=np.float64).reshape(
            n_rep, k_temps
        )[0]
    )
    pooled = "metric_minv" in ckpt
    metric = None
    if pooled:
        from .nuts import DenseMetric

        minv64 = np.asarray(ckpt["metric_minv"], dtype=np.float64)
        chol64 = np.stack([np.linalg.cholesky(m) for m in minv64])
        metric = DenseMetric(
            minv=jnp.asarray(minv64, dtype),
            chol_minv=jnp.asarray(chol64, dtype),
            p_chol=jnp.asarray(
                np.stack([np.linalg.inv(c).T for c in chol64]), dtype
            ),
        )
    sample_step = jax.vmap(
        _make_pt_step(
            vg, k_temps, target_accept, max_depth, False, pooled=pooled
        ),
        in_axes=((0, None, None) if pooled else (0, None)),
    )

    compiled = {}

    def run_chunk(carry, flags, length):
        if length not in compiled:
            if pooled:
                compiled[length] = jax.jit(
                    partial(
                        lambda c, f, m, s: lax.scan(
                            lambda cc, x: s(cc, x, m), c, f
                        ),
                        s=sample_step,
                    )
                )
            else:
                compiled[length] = jax.jit(
                    partial(lambda c, f, s: lax.scan(s, c, f), s=sample_step)
                )
        if pooled:
            return compiled[length](carry, flags, metric)
        return compiled[length](carry, flags)

    t0 = time.time()
    samples, lps, divs, leaps = [], [], [], []
    accs, depths = [], []
    pos = 0
    drawn0 = int(ckpt.get("n_samples_drawn", 0))
    while pos < n_samples:
        length = min(chunk_size, n_samples - pos)
        flags = (jnp.zeros(length, bool), jnp.zeros(length, bool))
        carry, (q0s, lp0s, div, leap, acc, dep) = run_chunk(
            carry, flags, length
        )
        samples.append(np.asarray(q0s))
        lps.append(np.asarray(lp0s))
        divs.append(np.asarray(div))
        leaps.append(np.asarray(leap))
        accs.append(np.asarray(acc))
        depths.append(np.asarray(dep))
        pos += length
        if checkpoint_path:
            save_pt_checkpoint(
                checkpoint_path,
                pt_checkpoint(carry, n_samples_drawn=drawn0 + pos, metric=metric),
            )
        if progress:
            logger.info(
                "PT resumed sampling %d/%d (%.1fs)",
                pos, n_samples, time.time() - t0,
            )

    info = _pt_info(carry, temperatures, lps, divs, leaps, k_temps,
                    accs=accs, depths=depths)
    new_ckpt = pt_checkpoint(carry, n_samples_drawn=drawn0 + n_samples, metric=metric)
    out = (
        np.concatenate(samples)
        if samples else np.zeros((0, n_rep, dim))
    )  # (S, R, dim)
    out = out[:, 0] if n_rep == 1 else out.transpose(1, 0, 2)
    return out, info, new_ckpt
