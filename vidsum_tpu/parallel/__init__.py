from vidsum_tpu.parallel.mesh import make_mesh
from vidsum_tpu.parallel.distributed import (
    DistributedConfig, global_mesh, init_distributed, is_coordinator,
    make_global_array, put_batch,
)
from vidsum_tpu.parallel.sharding import (
    batch_sharding, param_shardings, replicate, shard_params,
)
from vidsum_tpu.parallel.train_parallel import (
    make_sharded_finetune_step, make_sharded_pretrain_step,
)
from vidsum_tpu.parallel.ring_attention import (
    make_ring_forward, ring_attention, ring_attention_train,
)
from vidsum_tpu.parallel.seq_forward import (
    make_seq_sharded_finetune_step, make_seq_sharded_forward,
)
from vidsum_tpu.parallel.pipeline import (
    make_pp_forward, make_pp_train_step, stack_blocks,
)

__all__ = [
    "make_mesh", "batch_sharding", "param_shardings", "replicate",
    "shard_params", "make_sharded_finetune_step",
    "make_sharded_pretrain_step", "ring_attention", "make_ring_forward",
    "make_seq_sharded_forward", "make_seq_sharded_finetune_step",
    "ring_attention_train", "make_pp_forward", "make_pp_train_step",
    "stack_blocks", "DistributedConfig", "init_distributed",
    "is_coordinator", "global_mesh", "make_global_array", "put_batch",
]
