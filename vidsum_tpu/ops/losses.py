"""Training objectives.

- :func:`mse_with_mask_loss` — reference ``src/utils/utils.py:45-56``: masked
  MSE over raw logits; padded positions are zeroed in both prediction and
  target and the mean is taken over *all* positions (including padded — a
  reference quirk kept for training-dynamics parity).
- Pretrain losses — reference ``src/model/simnet_pretrain.py:35-69``:
  soft cross-entropy between score-weighted frame-feature mixtures and the
  frozen video embedding, entropy centering of sharpened scores, and the
  off-diagonal cosine "repelling" regularizer.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def mse_with_mask_loss(output: jnp.ndarray, targets: jnp.ndarray,
                       pad_mask: jnp.ndarray, reduction: str = "avg",
                       item_weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Masked MSE. ``output`` (B, N, 1), ``targets`` (B, N), ``pad_mask`` (B, N)
    True at padded frames.

    ``item_weight`` (B,) — per-video weights for batches padded to a static
    size by repeating items (``collate.make_batches(pad_to_batch=True)``):
    repeats get weight 0 and the mean divides by ``sum(weight)·N``, so the
    loss (and therefore the gradient) equals the reference's smaller final
    batch exactly (``/root/reference/src/train.py:58-64`` +
    ``src/utils/utils.py:45-56``). With all-ones weights this is the plain
    mean over every position (padded included — the reference quirk)."""
    output = output.squeeze(-1)
    keep = jnp.where(pad_mask, 0.0, 1.0).astype(output.dtype)
    diff = output * keep - targets * keep
    loss = diff * diff
    if item_weight is not None:
        loss = loss * item_weight[:, None].astype(loss.dtype)
        if reduction == "avg":
            return loss.sum() / (item_weight.sum() * loss.shape[1])
        return loss.sum()
    if reduction == "avg":
        return loss.mean()
    return loss.sum()


def soft_cross_entropy(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """−softmax(x2)·log(softmax(x1)), mean over all elements
    (simnet_pretrain.py:35-41)."""
    p1 = jax.nn.softmax(x1, axis=1)
    p2 = jax.nn.softmax(x2, axis=1)
    return (-p2 * jnp.log(p1)).mean()


def entropy_centering(mixture: jnp.ndarray,
                      pad_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Entropy of sharpened frame-score distribution, padded frames zeroed
    (simnet_pretrain.py:43-47). ``mixture`` (B, N, 1), already +1e-9 shifted."""
    x = mixture * jnp.log(mixture)
    if pad_mask is not None:
        x = jnp.where(pad_mask[..., None], 0.0, x)
    return x.mean(axis=1).mean()


def repelling_loss(x: jnp.ndarray,
                   pad_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Mean off-diagonal cosine similarity between frame features
    (simnet_pretrain.py:49-69). ``x`` (B, N, D)."""
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
    return sim.mean(axis=1).mean()
