"""Chain-level parallelism.

The reference is single-chain, single-threaded (SURVEY.md section 2.4). Here
chains are the embarrassingly-parallel axis:

- single device: ``vmap`` batches all chains into one XLA program — the
  (C, dim) leapfrog math becomes batched matvecs on the MXU;
- multi device: ``shard_map`` over a 1-D mesh axis 'chains' places C/devices
  chains on each device; there are NO collectives on the hot path (chains
  never communicate) — results are gathered once at the end, exactly the
  layout SURVEY.md section 5.8 prescribes.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..inference.nuts import run_nuts

CHAIN_AXIS = "chains"


def run_chains(
    vg: Callable,
    psi0: jnp.ndarray,   # (C, dim)
    keys: jnp.ndarray,   # (C, 2) PRNG keys
    n_samples: int,
    n_adapts: int,
    initial_step_size: float = 0.1,
    target_accept: float = 0.8,
    max_depth: int = 10,
    mesh: Optional[Mesh] = None,
):
    """Run C NUTS chains. Returns (samples (C, S, dim), info dict with a
    leading chain axis)."""

    def single(q0, key):
        return run_nuts(
            vg, q0, key,
            n_samples=n_samples, n_adapts=n_adapts,
            initial_step_size=initial_step_size,
            target_accept=target_accept,
            max_depth=max_depth,
        )

    batched = jax.vmap(single)

    if mesh is None:
        return jax.jit(batched)(psi0, keys)

    n_chains = psi0.shape[0]
    (axis_name,) = mesh.axis_names
    n_dev = mesh.devices.size
    if n_chains % n_dev != 0:
        raise ValueError(
            f"n_chains={n_chains} must be a multiple of mesh size {n_dev}"
        )

    sharded = jax.shard_map(
        batched,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=(P(axis_name), P(axis_name)),
        check_vma=False,
    )
    in_sharding = NamedSharding(mesh, P(axis_name))
    psi0 = jax.device_put(psi0, in_sharding)
    keys = jax.device_put(keys, in_sharding)
    return jax.jit(sharded)(psi0, keys)


def make_chain_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D device mesh over the chain axis."""
    devices = np.asarray(jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, (CHAIN_AXIS,))
