"""Checkpoint / resume for long MCMC runs.

The reference has NO checkpointing (SURVEY.md section 5.4): its only
warm-start is the ``initial_params`` kwarg. Here the full sampler state —
positions, adapted step sizes, adapted inverse metrics, and PRNG keys for
every chain — round-trips through a single ``.npz`` file, so a run can be
split across sessions/preemptions and continue *sampling* without repeating
warmup.

Protocol:
  state = solve_magi(...)                # via MagiResult.diagnostics
  save_checkpoint(path, checkpoint_from_result(result))
  ckpt = load_checkpoint(path)
  run_chains_resumed(vg, ckpt, n_more, ...)  # or solve_magi(..., resume=ckpt)
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class SamplerCheckpoint:
    """Everything needed to continue a run.

    ``phase`` is "sampling" (default; warmup finished — ``step_size`` /
    ``inv_mass`` are the frozen adapted values, Stan's post-warmup
    semantics) or "warmup" (the run died DURING warmup — relevant on this
    relay, which drops mid-run regularly). A warmup-phase checkpoint
    carries the full adaptation state in ``warmup``: the WarmupCarry
    pytree leaves (positions, dual-averaging state, Welford state, PRNG
    keys — saved/restored via tree_unflatten so the NamedTuple layout
    stays private to nuts.py), the warmup iteration index, the pooled
    metric components, and the partially-accumulated window moments.
    Resuming replays the deterministic window-aligned chunk schedule from
    that index: the continued run is bit-identical to an uninterrupted
    one (tests/test_checkpoint.py::test_warmup_resume_equality)."""

    psi: np.ndarray        # (C, dim) final positions
    step_size: np.ndarray  # (C,) adapted step sizes
    inv_mass: np.ndarray   # (C, dim) adapted inverse metrics
    key: np.ndarray        # (C, 2) uint32 PRNG keys
    n_samples_drawn: int = 0
    meta: Optional[Dict] = None
    phase: str = "sampling"
    warmup: Optional[Dict] = None


def checkpoint_from_result(result, samples_per_chain: Optional[np.ndarray] = None) -> SamplerCheckpoint:
    """Build a checkpoint from a finished MagiResult."""
    d = result.diagnostics
    n_chains = int(d["n_chains"])
    lp_pc = np.asarray(d["lp_per_chain"])
    n_keep = lp_pc.shape[-1] if lp_pc.ndim > 1 else lp_pc.shape[0]
    psi = np.asarray(d["final_psi"])
    return SamplerCheckpoint(
        psi=psi,
        step_size=np.atleast_1d(np.asarray(d["step_size"])),
        inv_mass=np.atleast_2d(np.asarray(d["inv_mass"])),
        key=np.asarray(d["final_key"]),
        n_samples_drawn=n_chains * n_keep,
        meta={"n_chains": n_chains},
    )


def save_checkpoint(path: str, ckpt: SamplerCheckpoint) -> None:
    import json

    arrays = dict(
        psi=ckpt.psi,
        step_size=ckpt.step_size,
        inv_mass=ckpt.inv_mass,
        key=ckpt.key,
        n_samples_drawn=np.asarray(ckpt.n_samples_drawn),
        meta=np.asarray(json.dumps(ckpt.meta) if ckpt.meta else ""),
        phase=np.asarray(ckpt.phase),
    )
    if ckpt.warmup is not None:
        w = ckpt.warmup
        arrays["wu_pos"] = np.asarray(int(w["pos"]))
        for i, leaf in enumerate(w["carry_leaves"]):
            arrays[f"wu_leaf_{i:03d}"] = np.asarray(leaf)
        for name in ("metric_minv", "metric_chol", "metric_pchol"):
            arrays[f"wu_{name}"] = np.asarray(w[name])
        for i, mom in enumerate(w["moments"]):
            for j, part in enumerate(mom):
                arrays[f"wu_mom_{i:03d}_{j}"] = np.asarray(part)
        arrays["wu_div"] = np.asarray(w["div"])
        env = w.get("envelope")
        if env is not None:
            # CurvatureEnvelope probes (parallel/chains.py): stored so a
            # resumed warmup folds the SAME precisions (bit-identical to
            # the uninterrupted run) without recomputing Hessians.
            for i, (pt, pr) in enumerate(zip(env["points"], env["precs"])):
                arrays[f"wu_env_pt_{i:03d}"] = np.asarray(pt)
                arrays[f"wu_env_prec_{i:03d}"] = np.asarray(pr)
    np.savez(path, **arrays)


def load_checkpoint(path: str) -> SamplerCheckpoint:
    import json

    with np.load(path) as z:
        meta_raw = str(z["meta"]) if "meta" in z else ""
        phase = str(z["phase"]) if "phase" in z else "sampling"
        warmup = None
        if phase == "warmup":
            leaves = [
                z[k] for k in sorted(z.files) if k.startswith("wu_leaf_")
            ]
            mom_keys = sorted(k for k in z.files if k.startswith("wu_mom_"))
            n_moms = len({k.rsplit("_", 1)[0] for k in mom_keys})
            moments = [
                tuple(z[f"wu_mom_{i:03d}_{j}"] for j in range(5))
                for i in range(n_moms)
            ]
            env_pts = sorted(
                k for k in z.files if k.startswith("wu_env_pt_")
            )
            envelope = None
            if env_pts:
                envelope = {
                    "points": [z[k] for k in env_pts],
                    "precs": [
                        z[k.replace("_pt_", "_prec_")] for k in env_pts
                    ],
                }
            warmup = {
                "pos": int(z["wu_pos"]),
                "carry_leaves": leaves,
                "metric_minv": z["wu_metric_minv"],
                "metric_chol": z["wu_metric_chol"],
                "metric_pchol": z["wu_metric_pchol"],
                "moments": moments,
                "div": z["wu_div"],
                "envelope": envelope,
            }
        return SamplerCheckpoint(
            psi=z["psi"],
            step_size=z["step_size"],
            inv_mass=z["inv_mass"],
            key=z["key"].astype(np.uint32),
            n_samples_drawn=int(z["n_samples_drawn"]),
            meta=json.loads(meta_raw) if meta_raw else None,
            phase=phase,
            warmup=warmup,
        )


def run_chains_resumed(
    vg: Callable,
    ckpt: SamplerCheckpoint,
    n_samples: int,
    max_depth: int = 10,
    dtype=None,
):
    """Continue sampling from a checkpoint: no warmup, frozen step size and
    metric (Stan's post-warmup semantics). Handles both the per-chain
    diagonal metric and the shared dense-pooled metric (meta
    {"metric": "dense-pooled"}, inv_mass saved as the (dim, dim) M^-1).
    Step-size jitter settings recorded in the checkpoint meta
    (parallel/chains.py ``step_jitter``) are honored, so a resumed run
    keeps the pocket-rescue behavior of the original.
    Returns (samples (C, S, dim), info, new_checkpoint)."""
    if ckpt.phase == "warmup":
        raise ValueError(
            "this checkpoint was written mid-warmup; resume it through "
            "solve_magi(resume=...) / run_chains(resume_ckpt=...), which "
            "continue adaptation from the saved state."
        )
    from .nuts import ChainState, DenseMetric
    from .nuts_batched import nuts_transition_batched

    if dtype is None:
        from ..config import default_dtype

        dtype = default_dtype()

    psi = jnp.asarray(ckpt.psi, dtype)
    eps = jnp.asarray(ckpt.step_size, dtype)
    dense = bool(ckpt.meta) and ckpt.meta.get("metric") == "dense-pooled"
    if dense:
        minv64 = np.asarray(ckpt.inv_mass, dtype=np.float64)
        chol64 = np.linalg.cholesky(minv64)
        inv_mass = DenseMetric(
            minv=jnp.asarray(minv64, dtype),
            chol_minv=jnp.asarray(chol64, dtype),
            p_chol=jnp.asarray(np.linalg.inv(chol64).T, dtype),
        )
    else:
        inv_mass = jnp.asarray(ckpt.inv_mass, dtype)  # (C, dim) per chain
    keys = jnp.asarray(ckpt.key)
    vg_b = jax.vmap(vg)

    # Step-jitter continuation: multipliers from the same keys-seeded
    # host RNG construction as _run_chains_pooled (a fresh deterministic
    # stream for the resumed segment).
    sj = float((ckpt.meta or {}).get("step_jitter", 0.0) or 0.0)
    sj_low = float((ckpt.meta or {}).get("step_jitter_low", 0.4) or 0.4)
    from ..parallel.chains import jitter_multipliers

    jit_rng = np.random.default_rng(
        np.asarray(ckpt.key).astype(np.uint64).ravel()
    )
    mults = jitter_multipliers(jit_rng, n_samples, sj, sj_low, dtype)

    def run(psi, keys, mults):
        logp0, grad0 = vg_b(psi)

        def step(chain, eps_mult):
            ks = jax.vmap(lambda k: jax.random.split(k))(chain.key)
            key, k_step = ks[:, 0], ks[:, 1]
            q, logp, grad, stats = nuts_transition_batched(
                vg_b, chain.q, chain.logp, chain.grad, k_step,
                eps * eps_mult, inv_mass, max_depth=max_depth,
            )
            return (
                ChainState(q=q, logp=logp, grad=grad, key=key),
                (q, logp, stats),
            )

        final, (qs, lps, stats) = jax.lax.scan(
            step, ChainState(q=psi, logp=logp0, grad=grad0, key=keys),
            mults, length=n_samples,
        )
        # scan emits (S, C, ...); downstream expects chains leading
        qs = jnp.swapaxes(qs, 0, 1)
        lps = lps.T
        stats = jax.tree_util.tree_map(
            lambda a: jnp.swapaxes(a, 0, 1), stats
        )
        return qs, lps, stats, final.q, final.key

    qs, lps, stats, final_q, final_key = jax.jit(run)(psi, keys, mults)
    info = {
        "lp": lps,
        "accept_prob": stats.accept_prob,
        "num_leapfrog": stats.num_leapfrog,
        "tree_depth": stats.tree_depth,
        "diverging": stats.diverging,
        "energy": stats.energy,
        "step_size": eps,
        "inv_mass": inv_mass.minv if dense else inv_mass,
    }
    new_ckpt = SamplerCheckpoint(
        psi=np.asarray(final_q),
        step_size=np.asarray(eps),
        inv_mass=np.asarray(inv_mass.minv if dense else inv_mass),
        key=np.asarray(final_key),
        n_samples_drawn=ckpt.n_samples_drawn + int(qs.shape[0] * qs.shape[1]),
        meta=ckpt.meta,
    )
    return qs, info, new_ckpt
