"""Batch collation with static-shape padding buckets.

The reference pads each batch to its max length with the sentinel value 1000
(``src/data/dataset.py:139-161``), producing a new tensor shape per batch —
fine for eager PyTorch, hostile to XLA (every new shape is a recompile). Here
each batch is padded up to a *length bucket* (multiple of
``DataConfig.length_bucket``, default 128 — the TPU lane width), so a whole
training run touches only a handful of compiled programs while sentinel-1000
semantics are preserved for parity (the mask is still derivable as
``features[:, :, 0] == pad_value``).
"""

from __future__ import annotations

import itertools
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np


def bucket_length(n: int, bucket: int = 128, max_len: Optional[int] = None) -> int:
    """Round ``n`` up to a multiple of ``bucket`` (clamped to ``max_len``)."""
    padded = ((n + bucket - 1) // bucket) * bucket
    if max_len is not None:
        padded = min(padded, max_len)
    return max(padded, bucket if max_len is None else min(bucket, max_len))


def pad_batch(features: Sequence[np.ndarray], targets: Sequence[np.ndarray],
              pad_value: float = 1000.0, bucket: int = 128,
              ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad a list of (N_i, D) feature arrays + (N_i,) targets to a shared
    bucketed length. Returns (features (B, N, D), targets (B, N), pad_mask
    (B, N) bool — True at padding).

    Targets are padded with ``pad_value`` like the reference's
    ``collate_fn_train`` (dataset.py:139-143); the loss masks them out.
    """
    B = len(features)
    max_n = max(f.shape[0] for f in features)
    N = bucket_length(max_n, bucket)
    D = features[0].shape[1]
    out_f = np.full((B, N, D), pad_value, dtype=np.float32)
    out_t = np.full((B, N), pad_value, dtype=np.float32)
    mask = np.ones((B, N), dtype=bool)
    for i, (f, t) in enumerate(zip(features, targets)):
        n = f.shape[0]
        out_f[i, :n] = f
        out_t[i, :n] = t
        mask[i, :n] = False
    return out_f, out_t, mask


def pad_batch_pretrain(features: Sequence[np.ndarray],
                       video_reps: Sequence[np.ndarray],
                       pad_value: float = 1000.0, bucket: int = 128,
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pretrain collate: padded frame features + stacked (B, 512) video reps
    (reference: ``collate_fn_pretrain``, dataset.py:157-161)."""
    B = len(features)
    max_n = max(f.shape[0] for f in features)
    N = bucket_length(max_n, bucket)
    D = features[0].shape[1]
    out_f = np.full((B, N, D), pad_value, dtype=np.float32)
    mask = np.ones((B, N), dtype=bool)
    for i, f in enumerate(features):
        out_f[i, :f.shape[0]] = f
        mask[i, :f.shape[0]] = False
    reps = np.stack([np.asarray(v, dtype=np.float32) for v in video_reps])
    return out_f, reps, mask


def make_batches(n_items: int, batch_size: int, *, shuffle: bool,
                 rng: Optional[np.random.Generator] = None,
                 drop_last: bool = False,
                 pad_to_batch: bool = False) -> Iterator[List[int]]:
    """Yield index batches. With ``pad_to_batch`` the last partial batch is
    filled by cycling its *own* indices (so shapes stay static for jit).
    Cycling the chunk — rather than borrowing epoch-front indices — keeps
    the padded batch's length bucket identical to the reference's smaller
    final batch, and the repeats are exact duplicates the train loss
    zero-weights (``mse_with_mask_loss(item_weight=…)``), so the mesh step
    computes exactly the reference's smaller-final-batch loss
    (``/root/reference/src/train.py:58-64`` semantics).
    """
    idx = np.arange(n_items)
    if shuffle:
        (rng or np.random.default_rng()).shuffle(idx)
    for start in range(0, n_items, batch_size):
        chunk = idx[start:start + batch_size].tolist()
        if len(chunk) < batch_size:
            if drop_last:
                return
            if pad_to_batch:
                reps = itertools.islice(itertools.cycle(chunk),
                                        batch_size - len(chunk))
                chunk = chunk + list(reps)
        yield chunk


def item_weights(batch_idx: List[int]) -> np.ndarray:
    """(B,) f32: 1.0 at the first occurrence of each index, 0.0 at repeats.
    Within one epoch each dataset index appears in at most one batch (the
    epoch order is a permutation), so repeats can only be ``pad_to_batch``
    fill — zero-weighting them makes the padded batch's loss/grads equal the
    unpadded smaller batch's."""
    seen: set = set()
    w = np.empty(len(batch_idx), dtype=np.float32)
    for j, i in enumerate(batch_idx):
        w[j] = 0.0 if i in seen else 1.0
        seen.add(i)
    return w
