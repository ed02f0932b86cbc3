from margipose_tpu.parallel.mesh import (
    batch_sharding,
    host_local_slice,
    host_local_values,
    make_mesh,
    param_shardings,
    put_batch_array,
    replicated_sharding,
    shard_batch,
    shard_variables,
)

__all__ = [
    "batch_sharding",
    "host_local_slice",
    "host_local_values",
    "make_mesh",
    "param_shardings",
    "put_batch_array",
    "replicated_sharding",
    "shard_batch",
    "shard_variables",
]
