"""No-U-Turn Sampler, TPU-native.

Counterpart of the reference's AdvancedHMC configuration
(/root/reference/src/samplers.jl:114-194): multinomial trajectory sampling +
generalized no-U-turn criterion + Stan warmup — but implemented from scratch
as fixed-shape JAX control flow so the whole transition jit-compiles and
batches over chains with vmap:

- leapfrog steps run inside ``lax.while_loop`` tree expansion; the doubling
  loop is another ``lax.while_loop`` capped at ``max_depth`` (default 10);
- sub-trajectory U-turns are detected with the O(log n)-memory checkpoint
  scheme of iterative NUTS (Phan & Pradhan; also Stan/numpyro) — buffers are
  statically sized (max_depth, dim);
- divergences and non-finite densities REJECT (weight -inf, divergence flag)
  instead of throwing — deliberately better than the reference's
  assert-on--Inf (samplers.jl:58-60; SURVEY.md section 7.4).

Kinetic energy uses a diagonal metric by default: K(p) = 0.5 p^T
diag(inv_mass) p with momenta drawn p ~ N(0, diag(1/inv_mass)) —
DiagEuclideanMetric parity (samplers.jl:144). Every metric-touching op also
accepts a ``DenseMetric`` (full M^-1 + its Cholesky), used by the
cross-chain pooled dense adaptation in parallel/chains.py — a TPU-native
extension with no reference counterpart (the batched (C, dim) @ (dim, dim)
momentum products ride the MXU).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .adapt import (
    DualAveragingState,
    WelfordState,
    build_window_schedule,
    da_init,
    da_restart,
    da_update,
    welford_init,
    welford_update,
    welford_variance_regularized,
)

MAX_DELTA_ENERGY = 1000.0  # Stan's divergence threshold


class DenseMetric(NamedTuple):
    """Full inverse-mass metric: M^-1 and chol(M^-1) (lower).

    Momenta are N(0, M) with M = (L L^T)^-1 for L = chol_minv, drawn as
    p = L^-T z. A plain (dim,) array everywhere a metric is accepted means
    the diagonal metric (static dispatch at trace time).

    ``p_chol`` (optional) is the PRECOMPUTED L^-T (upper triangular, the
    Cholesky-like factor of M): when present the momentum draw is one
    matmul instead of a triangular solve. XLA's TRSM is a ~dim-step
    sequential blocked algorithm — measured ~4-5 ms per transition at
    dim=799 on TPU v5e, the dominant per-transition fixed cost
    (benchmarks/tree_microbench.py) — while the matmul is ~10 us. All
    production constructors fill it (host float64 inverse); None keeps
    the solve fallback for hand-built metrics in tests."""

    minv: jnp.ndarray       # (dim, dim)
    chol_minv: jnp.ndarray  # (dim, dim) lower
    p_chol: jnp.ndarray | None = None  # (dim, dim) upper: p = p_chol @ z


def _minv_mv(inv_mass, p):
    """M^-1 p for either metric representation."""
    if isinstance(inv_mass, DenseMetric):
        # Full f32: TPU bf16 matmul noise perturbs trajectories/energies.
        return jnp.matmul(
            inv_mass.minv, p, precision=jax.lax.Precision.HIGHEST
        )
    return inv_mass * p


def _draw_momentum(key, q, inv_mass):
    z = jax.random.normal(key, q.shape, q.dtype)
    if isinstance(inv_mass, DenseMetric):
        if inv_mass.p_chol is not None:
            return jnp.matmul(
                inv_mass.p_chol, z, precision=jax.lax.Precision.HIGHEST
            )
        return jax.scipy.linalg.solve_triangular(
            inv_mass.chol_minv.T, z, lower=False
        )
    return z / jnp.sqrt(inv_mass)


class Tree(NamedTuple):
    """A trajectory segment (edges, aggregate momentum, multinomial proposal).

    Edge velocities v_* = M^-1 p_* ride along so U-turn checks against the
    edges never re-apply the metric (see _leapfrog_v)."""

    q_left: jnp.ndarray
    p_left: jnp.ndarray
    v_left: jnp.ndarray
    grad_left: jnp.ndarray
    q_right: jnp.ndarray
    p_right: jnp.ndarray
    v_right: jnp.ndarray
    grad_right: jnp.ndarray
    rho: jnp.ndarray          # sum of momenta over all leaves
    q_prop: jnp.ndarray
    logp_prop: jnp.ndarray
    grad_prop: jnp.ndarray
    log_sum_w: jnp.ndarray    # log sum of leaf weights exp(H0 - H)
    sum_accept: jnp.ndarray   # sum over leaves of min(1, exp(H0 - H))
    num_leaves: jnp.ndarray
    diverging: jnp.ndarray    # bool
    turning: jnp.ndarray      # bool


class NutsStats(NamedTuple):
    accept_prob: jnp.ndarray
    num_leapfrog: jnp.ndarray
    tree_depth: jnp.ndarray
    diverging: jnp.ndarray
    energy: jnp.ndarray
    step_size: jnp.ndarray


def _hdot(a, b):
    """Full-f32 vector dot: with |H| ~ dim/2 the default bf16 multiply
    passes put O(1) noise on kinetic energies — enough to wreck the
    acceptance statistic dual averaging consumes."""
    return jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST)


def _kinetic(p, inv_mass):
    return 0.5 * _hdot(p, _minv_mv(inv_mass, p))


def _leapfrog_v(vg, q, p, v, mgrad, grad, eps, inv_mass):
    """Velocity-carrying leapfrog: v = M^-1 p is maintained by linearity
    (v' = v + eps/2 M^-1 g), so the only metric product per leaf is
    M^-1 grad_new — whose result is ALSO the next leaf's incoming mgrad.
    Under the production dense-pooled metric this replaces the 2 + 2-per-
    U-turn-check (dim, dim) matmuls per leaf of the naive formulation with
    exactly one (kinetic energies and U-turn tests become dot products
    against the carried velocities). Returns
    (q_new, p_new, v_new, mgrad_new, logp_new, grad_new)."""
    half = 0.5 * eps
    p_half = p + half * grad
    v_half = v + half * mgrad
    q_new = q + eps * v_half
    logp_new, grad_new = vg(q_new)
    mgrad_new = _minv_mv(inv_mass, grad_new)
    p_new = p_half + half * grad_new
    v_new = v_half + half * mgrad_new
    return q_new, p_new, v_new, mgrad_new, logp_new, grad_new


def _is_turning(p_left, v_left, p_right, v_right, rho):
    """Generalized no-U-turn criterion with boundary-momentum correction
    (Betancourt; Stan/numpyro variant). v_* are the carried M^-1 p_*, so
    no metric products are needed here."""
    rho_c = rho - 0.5 * (p_left + p_right)
    t_left = _hdot(v_left, rho_c) <= 0.0
    t_right = _hdot(v_right, rho_c) <= 0.0
    return t_left | t_right


def _popcount32(x):
    """Branchless SWAR popcount for non-negative int32. Scalar while_loops
    here would vmap into lockstep masked vector loops — per LEAF, inside
    the innermost tree loop — and dominate the bookkeeping cost (measured:
    see docs/BENCHMARKS.md per-layer probe)."""
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    return (x * 0x01010101) >> 24


def _leaf_idx_to_ckpt_idxs(n):
    """Checkpoint index range for U-turn checks at leaf n (iterative NUTS).

    idx_max = popcount(n >> 1); idx_min = idx_max - (trailing ones of n) + 1.
    Fully branchless: trailing-ones(n) = ctz(n + 1) = popcount(lsb(n+1) - 1).
    """
    idx_max = _popcount32(n >> 1)
    np1 = n + 1
    lsb = np1 & -np1
    n_trail = _popcount32(lsb - 1)
    return idx_max - n_trail + 1, idx_max


def _is_iterative_turning(
    p_leaf, v_leaf, rho_cum, r_ckpts, v_ckpts, rho_ckpts, idx_min, idx_max
):
    """Check U-turns of every sub-subtree that ends at this (odd) leaf.

    Vectorized over ALL checkpoint rows at once (masked to the active
    [idx_min, idx_max] range) instead of a serial while_loop with dynamic
    row gathers: under vmap the serial loop costs lockstep iterations x
    per-chain gathers, while this form is two small (K, dim) contractions
    the VPU/MXU eat. Boolean result is identical (any vs first-hit)."""
    k = r_ckpts.shape[0]
    rho_sub = rho_cum[None, :] - rho_ckpts + r_ckpts          # (K, dim)
    rho_c = rho_sub - 0.5 * (r_ckpts + p_leaf[None, :])       # (K, dim)
    t_left = jnp.einsum(
        "kd,kd->k", v_ckpts, rho_c, precision=jax.lax.Precision.HIGHEST
    ) <= 0.0
    t_right = jnp.einsum(
        "kd,d->k", rho_c, v_leaf, precision=jax.lax.Precision.HIGHEST
    ) <= 0.0
    idx = jnp.arange(k, dtype=idx_max.dtype)
    active = (idx >= idx_min) & (idx <= idx_max)
    return jnp.any((t_left | t_right) & active)


def _build_subtree(
    vg, q0, p0, v0, grad0, num_leaves, eps_signed, inv_mass, h0, key,
    max_depth, max_delta_energy,
):
    """Build a subtree of ``num_leaves`` (traced) leapfrog steps outward from
    the given edge state, with internal U-turn checkpointing. Returns a Tree
    whose left edge is the FIRST leaf and right edge the LAST leaf in build
    order (caller re-orients by direction). ``v0`` is the edge velocity
    M^-1 p0 (carried by the caller; see _leapfrog_v)."""
    dim = q0.shape[0]
    dtype = q0.dtype
    neg_inf = jnp.asarray(-jnp.inf, dtype=dtype)
    mgrad0 = _minv_mv(inv_mass, grad0)

    class SubState(NamedTuple):
        leaf_idx: jnp.ndarray
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
        diverging: jnp.ndarray
        turning: jnp.ndarray
        r_ckpts: jnp.ndarray
        v_ckpts: jnp.ndarray
        rho_ckpts: jnp.ndarray
        key: jnp.ndarray

    def cond(s: SubState):
        return (s.leaf_idx < num_leaves) & (~s.diverging) & (~s.turning)

    def body(s: SubState):
        key, k_mn = jax.random.split(s.key)
        q, p, v, mgrad, logp, grad = _leapfrog_v(
            vg, s.q, s.p, s.v, s.mgrad, s.grad, eps_signed, inv_mass
        )
        h = -logp + 0.5 * _hdot(p, v)
        delta = h - h0
        bad = ~(delta <= max_delta_energy)  # NaN -> True
        w = jnp.where(bad, neg_inf, -delta)
        accept = jnp.where(bad, 0.0, jnp.exp(jnp.minimum(0.0, -delta)))

        log_sum_w = jnp.logaddexp(s.log_sum_w, w)
        take = jax.random.uniform(k_mn, dtype=dtype) < jnp.exp(w - log_sum_w)
        q_prop = jnp.where(take, q, s.q_prop)
        logp_prop = jnp.where(take, logp, s.logp_prop)
        grad_prop = jnp.where(take, grad, s.grad_prop)

        rho = s.rho + p
        is_first = s.leaf_idx == 0
        q_first = jnp.where(is_first, q, s.q_first)
        p_first = jnp.where(is_first, p, s.p_first)
        v_first = jnp.where(is_first, v, s.v_first)
        grad_first = jnp.where(is_first, grad, s.grad_first)

        idx_min, idx_max = _leaf_idx_to_ckpt_idxs(s.leaf_idx)
        is_even = (s.leaf_idx % 2) == 0
        # One-hot masked select instead of .at[idx].set: under vmap the
        # per-chain dynamic index becomes a scatter, which TPUs serialize;
        # a (max_depth, dim) where() is a dense select the VPU streams.
        write_row = (
            jnp.arange(s.r_ckpts.shape[0], dtype=idx_max.dtype) == idx_max
        ) & is_even
        r_ckpts = jnp.where(write_row[:, None], p[None, :], s.r_ckpts)
        v_ckpts = jnp.where(write_row[:, None], v[None, :], s.v_ckpts)
        rho_ckpts = jnp.where(write_row[:, None], rho[None, :], s.rho_ckpts)
        turning = jnp.where(
            is_even,
            jnp.asarray(False),
            _is_iterative_turning(
                p, v, rho, r_ckpts, v_ckpts, rho_ckpts, idx_min, idx_max
            ),
        )

        return SubState(
            leaf_idx=s.leaf_idx + 1,
            q=q, p=p, v=v, mgrad=mgrad, grad=grad,
            q_first=q_first, p_first=p_first, v_first=v_first,
            grad_first=grad_first,
            rho=rho,
            q_prop=q_prop, logp_prop=logp_prop, grad_prop=grad_prop,
            log_sum_w=log_sum_w,
            sum_accept=s.sum_accept + accept,
            diverging=bad | s.diverging,
            turning=turning,
            r_ckpts=r_ckpts, v_ckpts=v_ckpts, rho_ckpts=rho_ckpts,
            key=key,
        )

    init = SubState(
        leaf_idx=jnp.int32(0),
        q=q0, p=p0, v=v0, mgrad=mgrad0, grad=grad0,
        q_first=q0, p_first=p0, v_first=v0, grad_first=grad0,
        rho=jnp.zeros_like(p0),
        q_prop=q0, logp_prop=jnp.asarray(0.0, dtype), grad_prop=grad0,
        log_sum_w=neg_inf,
        sum_accept=jnp.asarray(0.0, dtype),
        diverging=jnp.asarray(False),
        turning=jnp.asarray(False),
        r_ckpts=jnp.zeros((max_depth, dim), dtype),
        v_ckpts=jnp.zeros((max_depth, dim), dtype),
        rho_ckpts=jnp.zeros((max_depth, dim), dtype),
        key=key,
    )
    s = lax.while_loop(cond, body, init)
    return Tree(
        q_left=s.q_first, p_left=s.p_first, v_left=s.v_first,
        grad_left=s.grad_first,
        q_right=s.q, p_right=s.p, v_right=s.v, grad_right=s.grad,
        rho=s.rho,
        q_prop=s.q_prop, logp_prop=s.logp_prop, grad_prop=s.grad_prop,
        log_sum_w=s.log_sum_w,
        sum_accept=s.sum_accept,
        num_leaves=s.leaf_idx.astype(dtype),
        diverging=s.diverging,
        turning=s.turning,
    )


def nuts_transition(
    vg: Callable,
    q: jnp.ndarray,
    logp: jnp.ndarray,
    grad: jnp.ndarray,
    key: jnp.ndarray,
    step_size: jnp.ndarray,
    inv_mass: jnp.ndarray,
    max_depth: int = 10,
    max_delta_energy: float = MAX_DELTA_ENERGY,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, NutsStats]:
    """One NUTS transition from (q, logp, grad). Returns the new state and
    per-transition statistics."""
    dtype = q.dtype
    key_mom, key_loop = jax.random.split(key)
    p0 = _draw_momentum(key_mom, q, inv_mass)
    v0 = _minv_mv(inv_mass, p0)
    h0 = -logp + 0.5 * _hdot(p0, v0)

    init_tree = Tree(
        q_left=q, p_left=p0, v_left=v0, grad_left=grad,
        q_right=q, p_right=p0, v_right=v0, grad_right=grad,
        rho=p0,
        q_prop=q, logp_prop=logp, grad_prop=grad,
        log_sum_w=jnp.zeros((), dtype),
        sum_accept=jnp.zeros((), dtype),
        num_leaves=jnp.zeros((), dtype),
        diverging=jnp.asarray(False),
        turning=jnp.asarray(False),
    )

    class LoopState(NamedTuple):
        tree: Tree
        depth: jnp.ndarray
        done: jnp.ndarray
        key: jnp.ndarray

    def cond(s: LoopState):
        return (s.depth < max_depth) & (~s.done)

    def body(s: LoopState):
        tree = s.tree
        key, k_dir, k_sub, k_merge = jax.random.split(s.key, 4)
        go_right = jax.random.bernoulli(k_dir)
        direction = jnp.where(go_right, 1.0, -1.0).astype(dtype)

        edge_q = jnp.where(go_right, tree.q_right, tree.q_left)
        edge_p = jnp.where(go_right, tree.p_right, tree.p_left)
        edge_v = jnp.where(go_right, tree.v_right, tree.v_left)
        edge_grad = jnp.where(go_right, tree.grad_right, tree.grad_left)

        num_leaves = jnp.int32(1) << s.depth
        sub = _build_subtree(
            vg, edge_q, edge_p, edge_v, edge_grad, num_leaves,
            direction * step_size, inv_mass, h0, k_sub,
            max_depth, max_delta_energy,
        )
        valid = ~(sub.diverging | sub.turning)

        # Biased progressive sampling across the doubling (Stan):
        # accept the new half's proposal with prob min(1, w_new / w_old).
        log_ratio = sub.log_sum_w - tree.log_sum_w
        take_new = valid & (
            jax.random.uniform(k_merge, dtype=dtype)
            < jnp.exp(jnp.minimum(0.0, log_ratio))
        )
        q_prop = jnp.where(take_new, sub.q_prop, tree.q_prop)
        logp_prop = jnp.where(take_new, sub.logp_prop, tree.logp_prop)
        grad_prop = jnp.where(take_new, sub.grad_prop, tree.grad_prop)

        # Combined-tree edges/rho (only committed when the subtree is valid).
        # In build order the subtree's left edge is the leaf nearest the old
        # tree; its right edge is the outermost leaf regardless of direction.
        new_q_left = jnp.where(go_right, tree.q_left, sub.q_right)
        new_p_left = jnp.where(go_right, tree.p_left, sub.p_right)
        new_v_left = jnp.where(go_right, tree.v_left, sub.v_right)
        new_grad_left = jnp.where(go_right, tree.grad_left, sub.grad_right)
        new_q_right = jnp.where(go_right, sub.q_right, tree.q_right)
        new_p_right = jnp.where(go_right, sub.p_right, tree.p_right)
        new_v_right = jnp.where(go_right, sub.v_right, tree.v_right)
        new_grad_right = jnp.where(go_right, sub.grad_right, tree.grad_right)
        rho = tree.rho + sub.rho
        turning_combined = _is_turning(
            new_p_left, new_v_left, new_p_right, new_v_right, rho
        )

        merged = Tree(
            q_left=jnp.where(valid, new_q_left, tree.q_left),
            p_left=jnp.where(valid, new_p_left, tree.p_left),
            v_left=jnp.where(valid, new_v_left, tree.v_left),
            grad_left=jnp.where(valid, new_grad_left, tree.grad_left),
            q_right=jnp.where(valid, new_q_right, tree.q_right),
            p_right=jnp.where(valid, new_p_right, tree.p_right),
            v_right=jnp.where(valid, new_v_right, tree.v_right),
            grad_right=jnp.where(valid, new_grad_right, tree.grad_right),
            rho=jnp.where(valid, rho, tree.rho),
            q_prop=q_prop, logp_prop=logp_prop, grad_prop=grad_prop,
            log_sum_w=jnp.where(valid, jnp.logaddexp(tree.log_sum_w, sub.log_sum_w), tree.log_sum_w),
            sum_accept=tree.sum_accept + sub.sum_accept,
            num_leaves=tree.num_leaves + sub.num_leaves,
            diverging=tree.diverging | sub.diverging,
            turning=sub.turning | (valid & turning_combined),
        )
        done = sub.diverging | sub.turning | turning_combined
        return LoopState(tree=merged, depth=s.depth + 1, done=done, key=key)

    final = lax.while_loop(
        cond, body,
        LoopState(tree=init_tree, depth=jnp.int32(0), done=jnp.asarray(False), key=key_loop),
    )
    tree = final.tree
    accept_prob = tree.sum_accept / jnp.maximum(tree.num_leaves, 1.0)
    stats = NutsStats(
        accept_prob=accept_prob,
        num_leapfrog=tree.num_leaves,
        tree_depth=final.depth,
        diverging=tree.diverging,
        energy=h0,
        step_size=step_size,
    )
    return tree.q_prop, tree.logp_prop, tree.grad_prop, stats


class ChainState(NamedTuple):
    q: jnp.ndarray
    logp: jnp.ndarray
    grad: jnp.ndarray
    key: jnp.ndarray


class WarmupCarry(NamedTuple):
    chain: ChainState
    da: DualAveragingState
    welford: WelfordState
    inv_mass: jnp.ndarray


class SampleCarry(NamedTuple):
    chain: ChainState
    eps: jnp.ndarray
    inv_mass: jnp.ndarray


def init_warmup_carry(vg, q0, key, initial_step_size) -> WarmupCarry:
    dtype = q0.dtype
    dim = q0.shape[0]
    logp0, grad0 = vg(q0)
    eps0 = jnp.asarray(initial_step_size, dtype)
    return WarmupCarry(
        chain=ChainState(q=q0, logp=logp0, grad=grad0, key=key),
        da=da_init(eps0),
        welford=welford_init(dim, dtype),
        inv_mass=jnp.ones((dim,), dtype),
    )


def make_warmup_step(vg, target_accept: float, max_depth: int, adapt_mass: bool):
    """Scan body for one warmup transition + adaptation update. xs =
    (in_window, window_end) booleans from build_window_schedule."""

    def warmup_step(carry: WarmupCarry, xs):
        in_win, win_end = xs
        chain = carry.chain
        dtype = chain.q.dtype
        dim = chain.q.shape[0]
        key, k_step = jax.random.split(chain.key)
        eps = jnp.exp(carry.da.log_eps).astype(dtype)
        q, logp, grad, stats = nuts_transition(
            vg, chain.q, chain.logp, chain.grad, k_step, eps, carry.inv_mass,
            max_depth=max_depth,
        )
        da = da_update(carry.da, stats.accept_prob, target_accept)

        welford = carry.welford
        if adapt_mass:
            updated = welford_update(welford, q)
            welford = jax.tree_util.tree_map(
                lambda a, b: jnp.where(in_win, a, b), updated, welford
            )
            new_inv_mass = welford_variance_regularized(welford)
            inv_mass = jnp.where(win_end, new_inv_mass, carry.inv_mass)
            welford = jax.tree_util.tree_map(
                lambda a, b: jnp.where(win_end, a, b),
                welford_init(dim, dtype), welford,
            )
            da = jax.tree_util.tree_map(
                lambda a, b: jnp.where(win_end, a, b), da_restart(da), da
            )
        else:
            inv_mass = carry.inv_mass

        new_carry = WarmupCarry(
            chain=ChainState(q=q, logp=logp, grad=grad, key=key),
            da=da, welford=welford, inv_mass=inv_mass,
        )
        return new_carry, stats.diverging

    return warmup_step


def make_warmup_step_pooled(vg, target_accept: float, max_depth: int):
    """Scan body for warmup under a SHARED dense metric (cross-chain pooled
    adaptation, parallel/chains.py). The metric is a traced argument — the
    host updates it between window-aligned chunks without retracing — so
    the in-scan adaptation only runs dual averaging (restarted at window
    ends); positions are emitted for the host-side covariance pooling."""

    def warmup_step(carry: WarmupCarry, xs, metric: DenseMetric):
        in_win, win_end = xs
        chain = carry.chain
        dtype = chain.q.dtype
        key, k_step = jax.random.split(chain.key)
        eps = jnp.exp(carry.da.log_eps).astype(dtype)
        q, logp, grad, stats = nuts_transition(
            vg, chain.q, chain.logp, chain.grad, k_step, eps, metric,
            max_depth=max_depth,
        )
        da = da_update(carry.da, stats.accept_prob, target_accept)
        da = jax.tree_util.tree_map(
            lambda a, b: jnp.where(win_end, a, b), da_restart(da), da
        )
        new_carry = WarmupCarry(
            chain=ChainState(q=q, logp=logp, grad=grad, key=key),
            da=da, welford=carry.welford, inv_mass=carry.inv_mass,
        )
        return new_carry, (q, stats.diverging)

    return warmup_step


def make_sample_step_pooled(vg, max_depth: int):
    """Post-warmup scan body under a shared dense metric (traced arg).

    The scan ``xs`` slot optionally carries a per-iteration step-size
    multiplier (scalar, shared across chains — see
    parallel/chains.py ``step_jitter``); ``xs=None`` keeps the frozen
    ``carry.eps`` exactly."""

    def sample_step(carry: SampleCarry, eps_mult, metric: DenseMetric):
        chain = carry.chain
        key, k_step = jax.random.split(chain.key)
        eps = carry.eps if eps_mult is None else carry.eps * eps_mult
        q, logp, grad, stats = nuts_transition(
            vg, chain.q, chain.logp, chain.grad, k_step, eps,
            metric, max_depth=max_depth,
        )
        new = SampleCarry(
            chain=ChainState(q=q, logp=logp, grad=grad, key=key),
            eps=carry.eps, inv_mass=carry.inv_mass,
        )
        return new, (q, logp, stats)

    return sample_step


def make_sample_step(vg, max_depth: int):
    """Scan body for one post-warmup transition (frozen eps/metric in the
    carry, so chunked drivers can thread them through device calls)."""

    def sample_step(carry: SampleCarry, _):
        chain = carry.chain
        key, k_step = jax.random.split(chain.key)
        q, logp, grad, stats = nuts_transition(
            vg, chain.q, chain.logp, chain.grad, k_step, carry.eps,
            carry.inv_mass, max_depth=max_depth,
        )
        new = SampleCarry(
            chain=ChainState(q=q, logp=logp, grad=grad, key=key),
            eps=carry.eps, inv_mass=carry.inv_mass,
        )
        return new, (q, logp, stats)

    return sample_step


def run_nuts(
    vg: Callable,
    q0: jnp.ndarray,
    key: jnp.ndarray,
    n_samples: int,
    n_adapts: int,
    initial_step_size: float = 0.1,
    target_accept: float = 0.8,
    max_depth: int = 10,
    adapt_mass: bool = True,
):
    """Single-chain NUTS with Stan warmup. Returns (samples, stats) where
    ``samples`` is (n_samples - n_adapts, dim) of post-warmup draws.

    Counterpart of run_nuts_sampler (/root/reference/src/samplers.jl:114-194)
    with drop_warmup=true semantics. Batch over chains with
    ``jax.vmap(lambda q0, key: run_nuts(...))``.
    """
    dtype = q0.dtype
    n_keep = n_samples - n_adapts

    in_window_np, window_end_np = build_window_schedule(n_adapts)
    in_window = jnp.asarray(in_window_np)
    window_end = jnp.asarray(window_end_np)

    carry0 = init_warmup_carry(vg, q0, key, initial_step_size)
    warmup_step = make_warmup_step(vg, target_accept, max_depth, adapt_mass)

    if n_adapts > 0:
        carry, warmup_div = lax.scan(
            warmup_step, carry0, (in_window, window_end), length=n_adapts
        )
    else:
        carry, warmup_div = carry0, jnp.zeros((0,), bool)

    eps_final = jnp.exp(carry.da.log_eps_avg).astype(dtype)
    inv_mass_final = carry.inv_mass

    sample_step = make_sample_step(vg, max_depth)
    final_carry, (samples, lp, stats) = lax.scan(
        sample_step,
        SampleCarry(chain=carry.chain, eps=eps_final, inv_mass=inv_mass_final),
        None, length=n_keep,
    )
    info = {
        "final_psi": final_carry.chain.q,
        "final_key": final_carry.chain.key,
        "lp": lp,
        "accept_prob": stats.accept_prob,
        "num_leapfrog": stats.num_leapfrog,
        "tree_depth": stats.tree_depth,
        "diverging": stats.diverging,
        "energy": stats.energy,
        "step_size": eps_final,
        "inv_mass": inv_mass_final,
        "warmup_diverging": warmup_div,
    }
    return samples, info
