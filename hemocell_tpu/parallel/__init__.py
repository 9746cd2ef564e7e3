from .sharding import (
    build_sharded_runner,
    field_spec,
    lattice_spec,
    make_mesh,
    shard_state,
    shard_step_config,
)

__all__ = [
    "build_sharded_runner",
    "field_spec",
    "lattice_spec",
    "make_mesh",
    "shard_state",
    "shard_step_config",
]
