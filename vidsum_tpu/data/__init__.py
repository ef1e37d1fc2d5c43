from vidsum_tpu.data.paths import PATH, ECCV16_PATH
from vidsum_tpu.data.datasets import (
    TSDataset, PreTrainDataset, PreTrainDatasetReady, UserSummaries,
)
from vidsum_tpu.data.collate import (
    pad_batch, pad_batch_pretrain, bucket_length, item_weights, make_batches,
)
from vidsum_tpu.data.splits import load_splits, split_keys_to_names

__all__ = [
    "PATH", "ECCV16_PATH",
    "TSDataset", "PreTrainDataset", "PreTrainDatasetReady", "UserSummaries",
    "pad_batch", "pad_batch_pretrain", "bucket_length", "item_weights",
    "make_batches",
    "load_splits", "split_keys_to_names",
]
