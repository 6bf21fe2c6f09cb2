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


def geometric_ladder(n_temps: int, t_max: float = 32.0) -> np.ndarray:
    """T_k = t_max^(k/(K-1)): [1, ..., t_max]."""
    if n_temps == 1:
        return np.ones(1)
    return t_max ** (np.arange(n_temps) / (n_temps - 1))


def auto_ladder(n_temps: int, dim: int) -> np.ndarray:
    """Dimension-aware geometric ladder.

    Swap acceptance between adjacent temperatures behaves like
    exp(-(dT/T)^2 dim / 2) for a dim-dimensional target, so the spacing
    must shrink as 1 + sqrt(2/dim) (measured: a [1..64] ladder over 6 rungs
    gets 0.5% swap acceptance at dim=799; this spacing gets tens of
    percent). High barriers in high dimension therefore need MANY rungs —
    prefer increasing n_temps over widening the ladder."""
    spacing = 1.0 + np.sqrt(2.0 / max(dim, 1))
    return spacing ** np.arange(n_temps)


class PTCarry(NamedTuple):
    qs: jnp.ndarray        # (K, dim)
    lp: jnp.ndarray        # (K,) UNTEMPERED log-posterior
    grads: jnp.ndarray     # (K, dim) untempered gradients
    key: jnp.ndarray
    da: object             # batched DualAveragingState (K,)
    welford: object        # batched WelfordState
    inv_mass: jnp.ndarray  # (K, dim)
    n_swap_accept: jnp.ndarray
    n_swap_try: jnp.ndarray
    iteration: jnp.ndarray


def _make_pt_step(vg: Callable, inv_temps: jnp.ndarray, target_accept: float,
                  max_depth: int, adapt: bool):
    """One PT iteration: K tempered NUTS transitions + one swap sweep."""
    k_temps = inv_temps.shape[0]

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

    def pt_step(carry: PTCarry, xs):
        in_win, win_end = xs if adapt else (None, None)
        key, k_step, k_swap = jax.random.split(carry.key, 3)
        step_keys = jax.random.split(k_step, k_temps)
        eps = jnp.exp(carry.da.log_eps if adapt else carry.da.log_eps_avg)
        eps = eps.astype(carry.qs.dtype)

        qs, lp, grads, stats = v_transition(
            carry.qs, carry.lp, carry.grads, step_keys, eps,
            carry.inv_mass, inv_temps,
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

        n_try = carry.n_swap_try + jnp.sum(valid & is_left).astype(jnp.int32)
        n_acc = carry.n_swap_accept + jnp.sum(do_swap & is_left).astype(jnp.int32)

        # --- adaptation (warmup only) ---
        da, welford, inv_mass = carry.da, carry.welford, carry.inv_mass
        if adapt:
            da = jax.vmap(
                lambda d, a: da_update(d, a, target_accept)
            )(da, stats.accept_prob)
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
            inv_mass=inv_mass, n_swap_accept=n_acc, n_swap_try=n_try,
            iteration=carry.iteration + 1,
        )
        out = (qs[0], lp[0], stats.diverging, stats.num_leapfrog)
        return new, out

    return pt_step


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
):
    """PT-NUTS. Returns (samples (S, dim) from the T=1 chain, info)."""
    dtype = psi0.dtype
    dim = psi0.shape[0]
    n_keep = n_samples - n_adapts
    if temperatures is None:
        temperatures = (
            geometric_ladder(n_temps, max_temp)
            if max_temp is not None
            else auto_ladder(n_temps, dim)
        )
    temperatures = np.asarray(temperatures, dtype=np.float64)
    k_temps = len(temperatures)
    inv_temps = jnp.asarray(1.0 / temperatures, dtype)

    lp0, g0 = vg(psi0)
    carry = PTCarry(
        qs=jnp.tile(psi0[None], (k_temps, 1)),
        lp=jnp.tile(lp0[None], (k_temps,)),
        grads=jnp.tile(g0[None], (k_temps, 1)),
        key=key,
        da=jax.vmap(lambda _: da_init(jnp.asarray(initial_step_size, dtype)))(
            jnp.arange(k_temps)
        ),
        welford=jax.vmap(lambda _: welford_init(dim, dtype))(
            jnp.arange(k_temps)
        ),
        inv_mass=jnp.ones((k_temps, dim), dtype),
        n_swap_accept=jnp.zeros((), jnp.int32),
        n_swap_try=jnp.zeros((), jnp.int32),
        iteration=jnp.int32(0),
    )

    in_window, window_end = build_window_schedule(n_adapts)
    warm_step = _make_pt_step(vg, inv_temps, target_accept, max_depth, True)
    sample_step = _make_pt_step(vg, inv_temps, target_accept, max_depth, False)

    compiled = {}

    def run_chunk(carry, step, flags, length, tag):
        key_ = (tag, length)
        if key_ not in compiled:
            compiled[key_] = jax.jit(
                partial(lambda c, f, s: lax.scan(s, c, f), s=step)
            )
        return compiled[key_](carry, flags)

    t0 = time.time()
    pos = 0
    warm_div = []
    while pos < n_adapts:
        length = min(chunk_size, n_adapts - pos)
        flags = (
            jnp.asarray(in_window[pos : pos + length]),
            jnp.asarray(window_end[pos : pos + length]),
        )
        carry, (q0s, lp0s, div, _) = run_chunk(carry, warm_step, flags, length, "w")
        warm_div.append(np.asarray(div))
        pos += length
        if progress:
            logger.info("PT warmup %d/%d (%.1fs)", pos, n_adapts, time.time() - t0)

    samples, lps, divs, leaps = [], [], [], []
    pos = 0
    while pos < n_keep:
        length = min(chunk_size, n_keep - pos)
        flags = (jnp.zeros(length, bool), jnp.zeros(length, bool))
        carry, (qs, lp0s, div, leap) = run_chunk(
            carry, sample_step, flags, length, "s"
        )
        samples.append(np.asarray(qs))
        lps.append(np.asarray(lp0s))
        divs.append(np.asarray(div))
        leaps.append(np.asarray(leap))
        pos += length
        if progress:
            logger.info("PT sampling %d/%d (%.1fs)", pos, n_keep, time.time() - t0)

    swap_rate = float(carry.n_swap_accept) / max(float(carry.n_swap_try), 1.0)
    info = {
        "lp": np.concatenate(lps) if lps else np.zeros(0),
        "diverging": np.concatenate(divs) if divs else np.zeros((0, k_temps)),
        "num_leapfrog": np.concatenate(leaps) if leaps else np.zeros((0, k_temps)),
        "swap_acceptance": swap_rate,
        "temperatures": temperatures,
        "step_size": np.asarray(jnp.exp(carry.da.log_eps_avg)),
        "inv_mass": np.asarray(carry.inv_mass),
        "final_psi": np.asarray(carry.qs),
        "final_key": np.asarray(carry.key),
    }
    return (
        np.concatenate(samples) if samples else np.zeros((0, dim)),
        info,
    )
