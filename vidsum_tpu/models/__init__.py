from vidsum_tpu.models.simnet import (
    init_simnet, simnet_apply, positional_encoding_table,
)
from vidsum_tpu.models.pretrain import init_pretrain_model, pretrain_apply

__all__ = [
    "init_simnet", "simnet_apply", "positional_encoding_table",
    "init_pretrain_model", "pretrain_apply",
]
