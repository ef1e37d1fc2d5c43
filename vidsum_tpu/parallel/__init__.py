from vidsum_tpu.parallel.mesh import make_mesh
from vidsum_tpu.parallel.sharding import (
    batch_sharding, param_shardings, replicate, shard_params,
)
from vidsum_tpu.parallel.train_parallel import make_sharded_finetune_step

__all__ = [
    "make_mesh", "batch_sharding", "param_shardings", "replicate",
    "shard_params", "make_sharded_finetune_step",
]
