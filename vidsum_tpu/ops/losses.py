"""Training objectives.

- :func:`mse_with_mask_loss` — reference ``src/utils/utils.py:45-56``: masked
  MSE over raw logits; padded positions are zeroed in both prediction and
  target and the mean is taken over *all* positions (including padded — a
  reference quirk kept for training-dynamics parity).
- Pretrain losses — reference ``src/model/simnet_pretrain.py:35-69``:
  soft cross-entropy between score-weighted frame-feature mixtures and the
  frozen video embedding, entropy centering of sharpened scores, and the
  off-diagonal cosine "repelling" regularizer.

Denominator contract (round 3): the reference pads each batch to its
*max-in-batch* length (``pad_sequence``, dataset.py:139-161) and its loss
means divide by that padded length — so the loss VALUE (and, through the
weight-decay-to-grad ratio, the training trajectory) depends on the realized
pad length. Our collate pads to static 128-buckets instead
(``data/collate.py``); dividing by the bucket length would silently rescale
every loss vs the reference. All padded-length denominators here therefore
use the *reference pad length* — the max true (unpadded) length in the
batch, derived in-graph from ``pad_mask`` — which equals the reference's
denominator for every batch the reference can construct, independent of how
far our buckets pad. Sharded steps that only see a shard of the batch pass
the globally-reduced length via ``denom_len``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def reference_pad_len(pad_mask: Optional[jnp.ndarray], n: int) -> jnp.ndarray:
    """The length the reference's ``pad_sequence`` would have padded this
    batch to: the max true length over the batch (dataset.py:139-143).
    Falls back to the padded width ``n`` when there is no mask."""
    if pad_mask is None:
        return jnp.asarray(n, jnp.float32)
    return jnp.max(jnp.sum(~pad_mask, axis=1)).astype(jnp.float32)


def mse_with_mask_loss(output: jnp.ndarray, targets: jnp.ndarray,
                       pad_mask: jnp.ndarray, reduction: str = "avg",
                       item_weight: Optional[jnp.ndarray] = None,
                       denom_len: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Masked MSE. ``output`` (B, N, 1), ``targets`` (B, N), ``pad_mask`` (B, N)
    True at padded frames.

    The mean divides by ``B · reference_pad_len`` — the denominator the
    reference's ``loss.mean()`` realizes over its max-in-batch-padded tensors
    (utils.py:54) — NOT by our bucket-padded width, so the loss is invariant
    to how far the length bucket pads (tests/test_losses.py). Sharded callers
    that see only a batch/sequence shard pass the globally-reduced
    ``denom_len`` (e.g. ``pmax`` over the data axis).

    ``item_weight`` (B,) — per-video weights for batches padded to a static
    size by repeating items (``collate.make_batches(pad_to_batch=True)``):
    repeats get weight 0 and the mean divides by
    ``sum(weight)·reference_pad_len``, so the loss (and therefore the
    gradient) equals the reference's smaller final batch exactly
    (``/root/reference/src/train.py:58-64`` + ``src/utils/utils.py:45-56``)."""
    output = output.squeeze(-1)
    keep = jnp.where(pad_mask, 0.0, 1.0).astype(output.dtype)
    diff = output * keep - targets * keep
    loss = diff * diff
    if denom_len is None:
        denom_len = reference_pad_len(pad_mask, loss.shape[1])
    denom_len = jnp.asarray(denom_len).astype(loss.dtype)
    if item_weight is not None:
        loss = loss * item_weight[:, None].astype(loss.dtype)
        if reduction == "avg":
            return loss.sum() / (item_weight.sum() * denom_len)
        return loss.sum()
    if reduction == "avg":
        return loss.sum() / (loss.shape[0] * denom_len)
    return loss.sum()


def soft_cross_entropy(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """−softmax(x2)·log(softmax(x1)), mean over all elements
    (simnet_pretrain.py:35-41)."""
    p1 = jax.nn.softmax(x1, axis=1)
    p2 = jax.nn.softmax(x2, axis=1)
    return (-p2 * jnp.log(p1)).mean()


def entropy_centering(mixture: jnp.ndarray,
                      pad_mask: Optional[jnp.ndarray],
                      denom_len: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Entropy of sharpened frame-score distribution, padded frames zeroed
    (simnet_pretrain.py:43-47). ``mixture`` (B, N, 1), already +1e-9 shifted.

    The reference's ``x.mean(dim=1).mean()`` divides by ``B · N_padded``
    (simnet_pretrain.py:47); with bucket padding the equivalent denominator
    is ``B · reference_pad_len`` (see module docstring)."""
    x = mixture * jnp.log(mixture)
    if pad_mask is not None:
        x = jnp.where(pad_mask[..., None], 0.0, x)
    if denom_len is None:
        denom_len = reference_pad_len(pad_mask, x.shape[1])
    return x.sum() / (x.shape[0] * x.shape[2]
                      * jnp.asarray(denom_len).astype(x.dtype))


def repelling_loss(x: jnp.ndarray,
                   pad_mask: Optional[jnp.ndarray],
                   denom_len: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean off-diagonal cosine similarity between frame features
    (simnet_pretrain.py:49-69). ``x`` (B, N, D).

    The reference's ``sim.mean(dim=1).mean()`` divides by ``B · N_padded²``
    (simnet_pretrain.py:67); padded rows/cols contribute 0 to the numerator,
    so with bucket padding the reference-equivalent denominator is
    ``B · reference_pad_len²`` (see module docstring)."""
    n_frames = x.shape[1]
    if pad_mask is not None:
        x = x * (~pad_mask)[..., None].astype(x.dtype)
    # safe norm: padded rows are all-zero and d||x||/dx = x/||x|| is 0/0
    # there — route zero rows around the sqrt so gradients stay finite
    # (forward value matches the reference's x/(norm+1e-9) exactly: 0).
    sq = jnp.sum(x * x, axis=2, keepdims=True)
    zero = sq == 0.0
    norm = jnp.where(zero, 0.0, jnp.sqrt(jnp.where(zero, 1.0, sq)))
    x = x / (norm + 1e-9)
    sim = jnp.einsum("bnd,bmd->bnm", x, x)
    off_diag = (jnp.eye(n_frames, dtype=x.dtype) == 0).astype(x.dtype)
    sim = sim * off_diag[None]
    if denom_len is None:
        denom_len = reference_pad_len(pad_mask, n_frames)
    denom_len = jnp.asarray(denom_len).astype(sim.dtype)
    return sim.sum() / (sim.shape[0] * denom_len * denom_len)
