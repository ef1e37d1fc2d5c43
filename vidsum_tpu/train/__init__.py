from vidsum_tpu.train.schedule import cosine_warmup_scale, reference_pretrain_schedule
from vidsum_tpu.train.checkpoint import (
    AsyncCheckpointer, load_checkpoint, save_checkpoint,
)
from vidsum_tpu.train.steps import (
    make_finetune_step, make_eval_forward, make_pretrain_step, make_optimizer,
)
from vidsum_tpu.train.finetune import finetune, FinetuneResult
from vidsum_tpu.train.pretraining import pretrain

__all__ = [
    "cosine_warmup_scale", "reference_pretrain_schedule",
    "save_checkpoint", "load_checkpoint", "AsyncCheckpointer",
    "make_finetune_step", "make_eval_forward", "make_pretrain_step",
    "make_optimizer", "finetune", "FinetuneResult", "pretrain",
]
