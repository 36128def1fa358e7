"""Device mesh + sharding specs (DP / TP / ZeRO-style optimizer sharding)."""

from reprover_tpu.parallel.mesh import make_mesh, local_mesh
from reprover_tpu.parallel.sharding import (
    batch_sharding,
    causal_param_partition_specs,
    param_partition_specs,
    replicated,
    shard_pytree,
    zero_partition_specs,
)

__all__ = [
    "make_mesh",
    "local_mesh",
    "batch_sharding",
    "causal_param_partition_specs",
    "param_partition_specs",
    "replicated",
    "shard_pytree",
    "zero_partition_specs",
]
