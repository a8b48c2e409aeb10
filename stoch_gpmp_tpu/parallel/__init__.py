from stoch_gpmp_tpu.parallel.sharding import (
    make_mesh,
    make_sharded_optimize,
    replicate,
    shard_planner_state,
)

__all__ = [
    "make_mesh",
    "make_sharded_optimize",
    "replicate",
    "shard_planner_state",
]
