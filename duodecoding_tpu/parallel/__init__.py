from duodecoding_tpu.parallel.mesh import make_mesh
from duodecoding_tpu.parallel.sharding import (
    cache_partition_spec,
    param_partition_specs,
    shard_cache,
    shard_params,
)

__all__ = [
    "make_mesh",
    "param_partition_specs",
    "cache_partition_spec",
    "shard_params",
    "shard_cache",
]
