from multimodn_tpu.parallel.mesh import make_mesh
from multimodn_tpu.parallel.sharding import (
    batch_sharding,
    replicate,
    shard_opt_state,
    shard_params,
)

__all__ = ["make_mesh", "batch_sharding", "replicate", "shard_params",
           "shard_opt_state"]
