"""Parallel execution layers: chain parallelism (vmap/shard_map over
chains, parallel/chains.py) and within-posterior time-grid sharding
(parallel/grid.py)."""

from .chains import CHAIN_AXIS, make_chain_mesh, run_chains
from .grid import (
    GRID_AXIS,
    make_grid_mesh,
    make_grid_sharded_data,
    make_grid_value_and_grad,
)

__all__ = [
    "CHAIN_AXIS",
    "GRID_AXIS",
    "make_chain_mesh",
    "make_grid_mesh",
    "make_grid_sharded_data",
    "make_grid_value_and_grad",
    "run_chains",
]
