from margipose_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated_sharding,
    shard_batch,
    shard_variables,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "param_shardings",
    "replicated_sharding",
    "shard_batch",
    "shard_variables",
]
