"""Multi-chip parallelism: spatial domain decomposition over a device mesh."""

from particle_simulator_tpu.parallel.domain import (
    exchange_halo,
    factor_mesh,
    grid_sharding,
    make_mesh,
    make_sharded_frame_fn,
    shard_state,
)

__all__ = [
    "exchange_halo",
    "factor_mesh",
    "grid_sharding",
    "make_mesh",
    "make_sharded_frame_fn",
    "shard_state",
]
