from .sharding import (
    build_sharded_runner,
    field_spec,
    lattice_spec,
    make_mesh,
    shard_state,
    shard_step_config,
)
from .sharded_step import build_shardmap_runner, shardmap_supported

__all__ = [
    "build_sharded_runner",
    "build_shardmap_runner",
    "field_spec",
    "lattice_spec",
    "make_mesh",
    "shard_state",
    "shard_step_config",
    "shardmap_supported",
]
