"""Hand-batched NUTS transition: the chain axis as an explicit (C, dim)
array axis instead of jax.vmap.

``jax.vmap(nuts_transition)`` (inference/nuts.py) is semantically right
but leaves large measured throughput on the floor. Under vmap, a
``while_loop``'s body executes for EVERY chain each iteration and the
ENTIRE carry is re-committed through masked selects — including three
(max_depth, dim) U-turn checkpoint buffers per chain, ~12 MB of streamed
select traffic per batched leaf at the production shape (C=64, dim=799),
and the loop counters themselves are per-chain values, which turns the
checkpoint-row write into a one-hot select over the whole buffer.
Measured (benchmarks/lockstep_probe.py, TPU v5e, production shape): one
lockstep leaf-iteration costs 228 us against a 47.8 us whitened-vg
floor — a 4.78x bookkeeping multiplier that dominates the E2E NUTS gap
(lockstep depth-variance itself is only 1.9x).

This module batches the chain axis by hand, which a vmap cannot express:

- loop counters (leaf index j, doubling index i) are UNBATCHED scalars.
  Chains advance in lockstep anyway (that is exactly what a vmapped
  while_loop does); making the counters scalar means the checkpoint row
  index ``popcount(j >> 1)`` is uniform across chains, so checkpoint
  writes become ``dynamic_update_slice`` of one (C, 1, dim) row instead
  of a (C, max_depth, dim) one-hot select — ~10x less buffer traffic;
- the even-leaf / odd-leaf split is a SCALAR predicate, so ``lax.cond``
  genuinely skips the (C, max_depth, dim) U-turn sweep on even leaves
  (under vmap it would be a select that always pays both branches);
- only the per-chain alive/done predicates are batched, and masking is
  applied exactly where the vmapped semantics require it, not over the
  whole carry.

Semantics are IDENTICAL to ``jax.vmap(nuts_transition)`` given the same
per-chain PRNG keys — same split structure, same uniform draws, same
select logic (tests/test_nuts_batched.py asserts trajectory-level
agreement). Reference counterpart: run_nuts_sampler
(/root/reference/src/samplers.jl:114-194) — same multinomial NUTS with
generalized U-turn, batched over chains, which the single-chain
single-threaded reference has no analogue of.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .adapt import da_init, da_restart, da_update
from .nuts import (
    MAX_DELTA_ENERGY,
    ChainState,
    DenseMetric,
    NutsStats,
    SampleCarry,
    WarmupCarry,
    _leaf_idx_to_ckpt_idxs,
    welford_init,
)

HI = jax.lax.Precision.HIGHEST


def _minv_mv_b(inv_mass, p):
    """M^-1 p for a (C, dim) momentum batch.

    DenseMetric -> one (C, dim) x (dim, dim) matmul (rides the MXU);
    (dim,) array -> shared diagonal; (C, dim) array -> per-chain diagonal.
    """
    if isinstance(inv_mass, DenseMetric):
        # p @ minv.T multiplies exactly the same scalar pairs as
        # matmul(minv, p_c) per chain (minv is symmetric only up to
        # rounding, so the transpose matters for vmap-parity).
        return jnp.matmul(p, inv_mass.minv.T, precision=HI)
    return inv_mass * p  # broadcasts over (dim,) or (C, dim)


def _rowdot(a, b):
    """Per-chain full-f32 dot: (C, dim) x (C, dim) -> (C,)."""
    return jnp.einsum("cd,cd->c", a, b, precision=HI)


def _draw_momentum_b(keys, q, inv_mass):
    """Per-chain momentum draws (same per-chain normals as the vmapped
    single-chain path). With DenseMetric.p_chol present this is one
    (C, dim) x (dim, dim) matmul; the triangular-solve fallback costs
    ~4-5 ms per call at dim=799 (XLA TRSM is sequential; see the
    DenseMetric docstring)."""
    z = jax.vmap(lambda k: jax.random.normal(k, q.shape[1:], q.dtype))(keys)
    if isinstance(inv_mass, DenseMetric):
        if inv_mass.p_chol is not None:
            return jnp.matmul(z, inv_mass.p_chol.T, precision=HI)
        return jax.scipy.linalg.solve_triangular(
            inv_mass.chol_minv.T, z.T, lower=False
        ).T
    return z / jnp.sqrt(inv_mass)


def _leapfrog_b(vg_b, q, p, v, mgrad, grad, eps_signed, inv_mass):
    """Velocity-carrying leapfrog on the (C, dim) batch (nuts._leapfrog_v
    semantics; eps_signed is (C,) — per-chain direction x step size)."""
    half = (0.5 * eps_signed)[:, None]
    p_half = p + half * grad
    v_half = v + half * mgrad
    q_new = q + eps_signed[:, None] * v_half
    logp_new, grad_new = vg_b(q_new)
    mgrad_new = _minv_mv_b(inv_mass, grad_new)
    p_new = p_half + half * grad_new
    v_new = v_half + half * mgrad_new
    return q_new, p_new, v_new, mgrad_new, logp_new, grad_new


def _is_turning_b(p_left, v_left, p_right, v_right, rho):
    """(C,) generalized-U-turn check (nuts._is_turning batched)."""
    rho_c = rho - 0.5 * (p_left + p_right)
    t_left = _rowdot(v_left, rho_c) <= 0.0
    t_right = _rowdot(v_right, rho_c) <= 0.0
    return t_left | t_right


def _is_iterative_turning_b(
    p_leaf, v_leaf, rho_cum, r_ckpts, v_ckpts, rho_ckpts, idx_min, idx_max
):
    """U-turn checks of every sub-subtree ending at this odd leaf, over
    the (C, K, dim) checkpoint buffers. idx_min/idx_max are SCALARS
    (uniform across chains — the leaf counter is unbatched)."""
    k = r_ckpts.shape[1]
    rho_sub = rho_cum[:, None, :] - rho_ckpts + r_ckpts        # (C, K, dim)
    rho_c = rho_sub - 0.5 * (r_ckpts + p_leaf[:, None, :])
    t_left = jnp.einsum("ckd,ckd->ck", v_ckpts, rho_c, precision=HI) <= 0.0
    t_right = jnp.einsum("ckd,cd->ck", rho_c, v_leaf, precision=HI) <= 0.0
    idx = jnp.arange(k, dtype=idx_max.dtype)
    active = (idx >= idx_min) & (idx <= idx_max)               # (K,)
    return jnp.any((t_left | t_right) & active[None, :], axis=1)


def _row_update(buf, val, row, write):
    """Write ``val`` (C, dim) into buffer row ``row`` (scalar) for chains
    where ``write`` (C,) holds; untouched rows cost nothing (in-place
    dynamic_update_slice) — the whole point of scalar loop counters."""
    old = lax.dynamic_slice_in_dim(buf, row, 1, axis=1)        # (C, 1, dim)
    new = jnp.where(write[:, None, None], val[:, None, :], old)
    return lax.dynamic_update_slice_in_dim(buf, new, row, axis=1)


class TreeB(NamedTuple):
    """Batched trajectory segment — nuts.Tree with a leading chain axis."""

    q_left: jnp.ndarray
    p_left: jnp.ndarray
    v_left: jnp.ndarray
    grad_left: jnp.ndarray
    q_right: jnp.ndarray
    p_right: jnp.ndarray
    v_right: jnp.ndarray
    grad_right: jnp.ndarray
    rho: jnp.ndarray
    q_prop: jnp.ndarray
    logp_prop: jnp.ndarray
    grad_prop: jnp.ndarray
    log_sum_w: jnp.ndarray
    sum_accept: jnp.ndarray
    num_leaves: jnp.ndarray
    diverging: jnp.ndarray
    turning: jnp.ndarray
    # The two endpoints of the divergent leapfrog step: q_div is the
    # state the step was taken FROM (last in-support point at the
    # pathology's edge), q_div_leaf the exploded leaf it produced. The
    # envelope probe point is found between them by a host-side
    # in-support bisection (CurvatureEnvelope.collect) — the edge alone
    # underestimates pocket curvature (measured 4.3x boost vs the 400x
    # the funnel-lite pocket needs) while the leaf alone sits
    # post-explosion where curvature is astronomical in every direction
    # (measured on FN production: 805 directions x6566, chains frozen).
    # (C, dim) when track_div_leaf, else (C, 0): zero-width buffers make
    # every select on them free, so the flag-off path pays nothing.
    q_div: jnp.ndarray
    q_div_leaf: jnp.ndarray


class _SubStateB(NamedTuple):
    j: jnp.ndarray            # SCALAR leaf counter
    alive: jnp.ndarray        # (C,) still building this subtree
    q: jnp.ndarray
    p: jnp.ndarray
    v: jnp.ndarray
    mgrad: jnp.ndarray
    grad: jnp.ndarray
    q_first: jnp.ndarray
    p_first: jnp.ndarray
    v_first: jnp.ndarray
    grad_first: jnp.ndarray
    rho: jnp.ndarray
    q_prop: jnp.ndarray
    logp_prop: jnp.ndarray
    grad_prop: jnp.ndarray
    log_sum_w: jnp.ndarray
    sum_accept: jnp.ndarray
    n_leaves: jnp.ndarray     # (C,) committed leaves
    diverging: jnp.ndarray
    turning: jnp.ndarray
    r_ckpts: jnp.ndarray      # (C, max_depth, dim)
    v_ckpts: jnp.ndarray
    rho_ckpts: jnp.ndarray
    keys: jnp.ndarray         # (C, 2)
    q_div: jnp.ndarray        # (C, dim) | (C, 0) — see TreeB.q_div
    q_div_leaf: jnp.ndarray   # (C, dim) | (C, 0)


def _build_subtree_b(
    vg_b, q0, p0, v0, grad0, num_leaves, eps_signed, inv_mass, h0, keys,
    alive0, max_depth, max_delta_energy, track_div_leaf=False,
):
    """Build ``num_leaves`` (scalar) leapfrog steps outward for every
    alive chain. Mirrors nuts._build_subtree per chain: a chain commits
    its leaf state while alive and freezes the step it diverges/turns."""
    C, dim = q0.shape
    dtype = q0.dtype
    neg_inf = jnp.asarray(-jnp.inf, dtype=dtype)
    mgrad0 = _minv_mv_b(inv_mass, grad0)
    false_c = jnp.zeros((C,), bool)

    def cond(s: _SubStateB):
        return (s.j < num_leaves) & jnp.any(s.alive)

    def body(s: _SubStateB):
        ks = jax.vmap(lambda k: jax.random.split(k))(s.keys)   # (C, 2, 2)
        keys_new, k_mn = ks[:, 0], ks[:, 1]
        alive = s.alive

        q, p, v, mgrad, grad = s.q, s.p, s.v, s.mgrad, s.grad
        q_n, p_n, v_n, mgrad_n, logp_n, grad_n = _leapfrog_b(
            vg_b, q, p, v, mgrad, grad, eps_signed, inv_mass
        )
        h = -logp_n + 0.5 * _rowdot(p_n, v_n)
        delta = h - h0
        bad = ~(delta <= max_delta_energy)                     # NaN -> True
        w = jnp.where(bad, neg_inf, -delta)
        accept = jnp.where(bad, 0.0, jnp.exp(jnp.minimum(0.0, -delta)))

        log_sum_w = jnp.logaddexp(s.log_sum_w, w)
        u = jax.vmap(lambda k: jax.random.uniform(k, dtype=dtype))(k_mn)
        take = alive & (u < jnp.exp(w - log_sum_w))
        take_col = take[:, None]
        q_prop = jnp.where(take_col, q_n, s.q_prop)
        logp_prop = jnp.where(take, logp_n, s.logp_prop)
        grad_prop = jnp.where(take_col, grad_n, s.grad_prop)

        alive_col = alive[:, None]
        rho = jnp.where(alive_col, s.rho + p_n, s.rho)
        is_first = s.j == 0                                     # scalar
        first = alive_col & is_first
        q_first = jnp.where(first, q_n, s.q_first)
        p_first = jnp.where(first, p_n, s.p_first)
        v_first = jnp.where(first, v_n, s.v_first)
        grad_first = jnp.where(first, grad_n, s.grad_first)

        idx_min, idx_max = _leaf_idx_to_ckpt_idxs(s.j)          # scalars
        is_even = (s.j % 2) == 0                                # scalar
        write = alive & is_even
        r_ckpts = _row_update(s.r_ckpts, p_n, idx_max, write)
        v_ckpts = _row_update(s.v_ckpts, v_n, idx_max, write)
        rho_ckpts = _row_update(s.rho_ckpts, rho, idx_max, write)

        turned = lax.cond(
            is_even,
            lambda: false_c,
            lambda: _is_iterative_turning_b(
                p_n, v_n, rho, r_ckpts, v_ckpts, rho_ckpts, idx_min, idx_max
            ),
        )

        # A chain freezes at its first bad leaf (alive drops), so this
        # writes at most once per subtree; zero-width when not tracking.
        # Both endpoints of the divergent step are recorded — see
        # TreeB.q_div for why neither alone is a usable curvature probe.
        kdiv = s.q_div.shape[1]
        newly_bad = (alive & bad)[:, None]
        q_div = jnp.where(newly_bad, q[:, :kdiv], s.q_div)
        q_div_leaf = jnp.where(newly_bad, q_n[:, :kdiv], s.q_div_leaf)

        return _SubStateB(
            j=s.j + 1,
            alive=alive & ~(bad | turned),
            q=jnp.where(alive_col, q_n, q),
            p=jnp.where(alive_col, p_n, p),
            v=jnp.where(alive_col, v_n, v),
            mgrad=jnp.where(alive_col, mgrad_n, mgrad),
            grad=jnp.where(alive_col, grad_n, grad),
            q_first=q_first, p_first=p_first, v_first=v_first,
            grad_first=grad_first,
            rho=rho,
            q_prop=q_prop, logp_prop=logp_prop, grad_prop=grad_prop,
            log_sum_w=jnp.where(alive, log_sum_w, s.log_sum_w),
            sum_accept=jnp.where(alive, s.sum_accept + accept, s.sum_accept),
            n_leaves=s.n_leaves + alive.astype(s.n_leaves.dtype),
            diverging=jnp.where(alive, s.diverging | bad, s.diverging),
            turning=jnp.where(alive, turned, s.turning),
            r_ckpts=r_ckpts, v_ckpts=v_ckpts, rho_ckpts=rho_ckpts,
            keys=jnp.where(alive[:, None], keys_new, s.keys),
            q_div=q_div,
            q_div_leaf=q_div_leaf,
        )

    init = _SubStateB(
        j=jnp.int32(0),
        alive=alive0,
        q=q0, p=p0, v=v0, mgrad=mgrad0, grad=grad0,
        q_first=q0, p_first=p0, v_first=v0, grad_first=grad0,
        rho=jnp.zeros_like(p0),
        q_prop=q0, logp_prop=jnp.zeros((C,), dtype), grad_prop=grad0,
        log_sum_w=jnp.full((C,), -jnp.inf, dtype),
        sum_accept=jnp.zeros((C,), dtype),
        n_leaves=jnp.zeros((C,), dtype),
        diverging=false_c,
        turning=false_c,
        r_ckpts=jnp.zeros((C, max_depth, dim), dtype),
        v_ckpts=jnp.zeros((C, max_depth, dim), dtype),
        rho_ckpts=jnp.zeros((C, max_depth, dim), dtype),
        keys=keys,
        q_div=jnp.zeros((C, dim if track_div_leaf else 0), dtype),
        q_div_leaf=jnp.zeros((C, dim if track_div_leaf else 0), dtype),
    )
    s = lax.while_loop(cond, body, init)
    return TreeB(
        q_left=s.q_first, p_left=s.p_first, v_left=s.v_first,
        grad_left=s.grad_first,
        q_right=s.q, p_right=s.p, v_right=s.v, grad_right=s.grad,
        rho=s.rho,
        q_prop=s.q_prop, logp_prop=s.logp_prop, grad_prop=s.grad_prop,
        log_sum_w=s.log_sum_w,
        sum_accept=s.sum_accept,
        num_leaves=s.n_leaves,
        diverging=s.diverging,
        turning=s.turning,
        q_div=s.q_div,
        q_div_leaf=s.q_div_leaf,
    )


class _LoopStateB(NamedTuple):
    tree: TreeB
    depth: jnp.ndarray   # (C,) per-chain final depth (stats)
    done: jnp.ndarray    # (C,)
    keys: jnp.ndarray    # (C, 2)
    i: jnp.ndarray       # SCALAR doubling counter


def nuts_transition_batched(
    vg_b: Callable,
    q: jnp.ndarray,        # (C, dim)
    logp: jnp.ndarray,     # (C,)
    grad: jnp.ndarray,     # (C, dim)
    keys: jnp.ndarray,     # (C, 2)
    step_size,             # scalar or (C,)
    inv_mass,              # DenseMetric (shared) | (dim,) | (C, dim)
    max_depth: int = 10,
    max_delta_energy: float = MAX_DELTA_ENERGY,
    track_div_leaf: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, NutsStats]:
    """One NUTS transition for all C chains. ``vg_b`` maps (C, dim) ->
    ((C,), (C, dim)). Returns (q', logp', grad', NutsStats) with leading
    chain axes — the drop-in batched counterpart of
    ``jax.vmap(nuts.nuts_transition)``.

    ``track_div_leaf`` (static): additionally return a 5th output
    q_div (C, dim) — each diverging chain's last in-support position
    before the leapfrog step that tripped max_delta_energy (zeros for
    non-diverging chains); see TreeB.q_div for why neither the exploded
    leaf nor the transition's emitted position works as a curvature
    probe. Used by CurvatureEnvelope warmup probes; False keeps the
    exact 4-tuple contract and adds zero carried state ((C, 0) buffers)."""
    C, dim = q.shape
    dtype = q.dtype
    eps = jnp.broadcast_to(jnp.asarray(step_size, dtype), (C,))

    ks = jax.vmap(lambda k: jax.random.split(k))(keys)
    key_mom, key_loop = ks[:, 0], ks[:, 1]
    p0 = _draw_momentum_b(key_mom, q, inv_mass)
    v0 = _minv_mv_b(inv_mass, p0)
    h0 = -logp + 0.5 * _rowdot(p0, v0)

    init_tree = TreeB(
        q_left=q, p_left=p0, v_left=v0, grad_left=grad,
        q_right=q, p_right=p0, v_right=v0, grad_right=grad,
        rho=p0,
        q_prop=q, logp_prop=logp, grad_prop=grad,
        log_sum_w=jnp.zeros((C,), dtype),
        sum_accept=jnp.zeros((C,), dtype),
        num_leaves=jnp.zeros((C,), dtype),
        diverging=jnp.zeros((C,), bool),
        turning=jnp.zeros((C,), bool),
        q_div=jnp.zeros((C, dim if track_div_leaf else 0), dtype),
        q_div_leaf=jnp.zeros((C, dim if track_div_leaf else 0), dtype),
    )

    def cond(s: _LoopStateB):
        return (s.i < max_depth) & jnp.any(~s.done)

    def body(s: _LoopStateB):
        tree = s.tree
        upd = ~s.done                                          # (C,)
        upd_col = upd[:, None]
        ks = jax.vmap(lambda k: jax.random.split(k, 4))(s.keys)  # (C, 4, 2)
        # same order as nuts.nuts_transition: carry key FIRST
        key_next, k_dir, k_sub, k_merge = (
            ks[:, 0], ks[:, 1], ks[:, 2], ks[:, 3]
        )
        go_right = jax.vmap(jax.random.bernoulli)(k_dir)        # (C,)
        gr_col = go_right[:, None]
        direction = jnp.where(go_right, 1.0, -1.0).astype(dtype)

        edge_q = jnp.where(gr_col, tree.q_right, tree.q_left)
        edge_p = jnp.where(gr_col, tree.p_right, tree.p_left)
        edge_v = jnp.where(gr_col, tree.v_right, tree.v_left)
        edge_grad = jnp.where(gr_col, tree.grad_right, tree.grad_left)

        num_leaves = jnp.int32(1) << s.i                        # SCALAR
        sub = _build_subtree_b(
            vg_b, edge_q, edge_p, edge_v, edge_grad, num_leaves,
            direction * eps, inv_mass, h0, k_sub, upd,
            max_depth, max_delta_energy, track_div_leaf,
        )
        valid = upd & ~(sub.diverging | sub.turning)
        valid_col = valid[:, None]

        log_ratio = sub.log_sum_w - tree.log_sum_w
        u = jax.vmap(lambda k: jax.random.uniform(k, dtype=dtype))(k_merge)
        take_new = valid & (u < jnp.exp(jnp.minimum(0.0, log_ratio)))
        take_col = take_new[:, None]
        q_prop = jnp.where(take_col, sub.q_prop, tree.q_prop)
        logp_prop = jnp.where(take_new, sub.logp_prop, tree.logp_prop)
        grad_prop = jnp.where(take_col, sub.grad_prop, tree.grad_prop)

        new_q_left = jnp.where(gr_col, tree.q_left, sub.q_right)
        new_p_left = jnp.where(gr_col, tree.p_left, sub.p_right)
        new_v_left = jnp.where(gr_col, tree.v_left, sub.v_right)
        new_grad_left = jnp.where(gr_col, tree.grad_left, sub.grad_right)
        new_q_right = jnp.where(gr_col, sub.q_right, tree.q_right)
        new_p_right = jnp.where(gr_col, sub.p_right, tree.p_right)
        new_v_right = jnp.where(gr_col, sub.v_right, tree.v_right)
        new_grad_right = jnp.where(gr_col, sub.grad_right, tree.grad_right)
        rho = tree.rho + sub.rho
        turning_combined = _is_turning_b(
            new_p_left, new_v_left, new_p_right, new_v_right, rho
        )

        merged = TreeB(
            q_left=jnp.where(valid_col, new_q_left, tree.q_left),
            p_left=jnp.where(valid_col, new_p_left, tree.p_left),
            v_left=jnp.where(valid_col, new_v_left, tree.v_left),
            grad_left=jnp.where(valid_col, new_grad_left, tree.grad_left),
            q_right=jnp.where(valid_col, new_q_right, tree.q_right),
            p_right=jnp.where(valid_col, new_p_right, tree.p_right),
            v_right=jnp.where(valid_col, new_v_right, tree.v_right),
            grad_right=jnp.where(valid_col, new_grad_right, tree.grad_right),
            rho=jnp.where(valid_col, rho, tree.rho),
            q_prop=q_prop, logp_prop=logp_prop, grad_prop=grad_prop,
            log_sum_w=jnp.where(
                valid, jnp.logaddexp(tree.log_sum_w, sub.log_sum_w),
                tree.log_sum_w,
            ),
            sum_accept=jnp.where(
                upd, tree.sum_accept + sub.sum_accept, tree.sum_accept
            ),
            num_leaves=jnp.where(
                upd, tree.num_leaves + sub.num_leaves, tree.num_leaves
            ),
            diverging=jnp.where(
                upd, tree.diverging | sub.diverging, tree.diverging
            ),
            turning=jnp.where(
                upd, sub.turning | (valid & turning_combined), tree.turning
            ),
            # at most one divergent subtree per transition (done is set),
            # so this write happens once per diverging chain
            q_div=jnp.where(
                (upd & sub.diverging)[:, None], sub.q_div, tree.q_div
            ),
            q_div_leaf=jnp.where(
                (upd & sub.diverging)[:, None], sub.q_div_leaf,
                tree.q_div_leaf,
            ),
        )
        done = s.done | (
            upd & (sub.diverging | sub.turning | turning_combined)
        )
        return _LoopStateB(
            tree=merged,
            depth=jnp.where(upd, s.i + 1, s.depth),
            done=done,
            keys=jnp.where(upd[:, None], key_next, s.keys),
            i=s.i + 1,
        )

    final = lax.while_loop(
        cond, body,
        _LoopStateB(
            tree=init_tree,
            depth=jnp.zeros((C,), jnp.int32),
            done=jnp.zeros((C,), bool),
            keys=key_loop,
            i=jnp.int32(0),
        ),
    )
    tree = final.tree
    accept_prob = tree.sum_accept / jnp.maximum(tree.num_leaves, 1.0)
    stats = NutsStats(
        accept_prob=accept_prob,
        num_leapfrog=tree.num_leaves,
        tree_depth=final.depth,
        diverging=tree.diverging,
        energy=h0,
        step_size=eps,
    )
    if track_div_leaf:
        return (
            tree.q_prop, tree.logp_prop, tree.grad_prop, stats,
            (tree.q_div, tree.q_div_leaf),
        )
    return tree.q_prop, tree.logp_prop, tree.grad_prop, stats


# ---------------------------------------------------------------------------
# Scan-step factories (batched counterparts of nuts.make_*_pooled)
# ---------------------------------------------------------------------------


def init_warmup_carry_batched(
    vg_b, q0s, keys, initial_step_size
) -> WarmupCarry:
    """WarmupCarry whose fields carry a leading chain axis (the pooled
    driver never uses the per-chain welford/inv_mass; they are kept for
    structural compatibility with the vmapped carry)."""
    C, dim = q0s.shape
    dtype = q0s.dtype
    logp0, grad0 = vg_b(q0s)
    eps0 = jnp.full((C,), initial_step_size, dtype)
    return WarmupCarry(
        chain=ChainState(q=q0s, logp=logp0, grad=grad0, key=keys),
        da=jax.vmap(da_init)(eps0),
        welford=jax.vmap(lambda _: welford_init(dim, dtype))(
            jnp.arange(C)
        ),
        inv_mass=jnp.ones((C, dim), dtype),
    )


def make_warmup_step_pooled_batched(
    vg_b, target_accept: float, max_depth: int, track_div_leaf: bool = False
):
    """Scan body for batched warmup under a SHARED dense metric (traced
    arg; see nuts.make_warmup_step_pooled). xs = (in_win, win_end)
    SCALAR booleans — identical across chains, so they are not tiled.

    ``track_div_leaf``: ys additionally carry the divergent step's two
    endpoints ((C, dim) edge, (C, dim) exploded leaf) per step for
    CurvatureEnvelope probes (zeros when the step did not diverge)."""

    def warmup_step(carry: WarmupCarry, xs, metric: DenseMetric):
        in_win, win_end = xs
        chain = carry.chain
        dtype = chain.q.dtype
        ks = jax.vmap(lambda k: jax.random.split(k))(chain.key)
        key, k_step = ks[:, 0], ks[:, 1]
        eps = jnp.exp(carry.da.log_eps).astype(dtype)
        out = nuts_transition_batched(
            vg_b, chain.q, chain.logp, chain.grad, k_step, eps, metric,
            max_depth=max_depth, track_div_leaf=track_div_leaf,
        )
        q, logp, grad, stats = out[:4]
        da = jax.vmap(lambda d, a: da_update(d, a, target_accept))(
            carry.da, stats.accept_prob
        )
        da = jax.tree_util.tree_map(
            lambda a, b: jnp.where(win_end, a, b),
            jax.vmap(da_restart)(da), da,
        )
        new_carry = WarmupCarry(
            chain=ChainState(q=q, logp=logp, grad=grad, key=key),
            da=da, welford=carry.welford, inv_mass=carry.inv_mass,
        )
        if track_div_leaf:
            return new_carry, (q, stats.diverging, out[4])
        return new_carry, (q, stats.diverging)

    return warmup_step


def make_sample_step_pooled_batched(vg_b, max_depth: int):
    """Post-warmup scan body under a shared dense metric (traced arg).

    The scan ``xs`` slot optionally carries a per-iteration step-size
    multiplier (scalar, shared across chains — see
    parallel/chains.py ``step_jitter``); ``xs=None`` keeps the frozen
    ``carry.eps`` exactly. The multiplier is deliberately SHARED: the
    lockstep tree loop runs until every chain is done, so an
    independent per-chain draw would put a small-eps (deep-tree) chain
    in nearly every batched iteration and the whole batch would pay the
    deep-tree cost each time."""

    def sample_step(carry: SampleCarry, eps_mult, metric: DenseMetric):
        chain = carry.chain
        ks = jax.vmap(lambda k: jax.random.split(k))(chain.key)
        key, k_step = ks[:, 0], ks[:, 1]
        eps = carry.eps if eps_mult is None else carry.eps * eps_mult
        q, logp, grad, stats = nuts_transition_batched(
            vg_b, chain.q, chain.logp, chain.grad, k_step, eps,
            metric, max_depth=max_depth,
        )
        new = SampleCarry(
            chain=ChainState(q=q, logp=logp, grad=grad, key=key),
            eps=carry.eps, inv_mass=carry.inv_mass,
        )
        return new, (q, logp, stats)

    return sample_step
