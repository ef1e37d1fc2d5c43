"""DINO-style self-supervised pretraining objective.

Behavior contract (reference: ``src/model/simnet_pretrain.py:12-100``): wrap a
SimNet scorer whose ``d_model = feature_dim`` with a Linear
``feature_dim→512`` video transform matching the frozen R3D-18 video
embedding, and compute three losses:

(a) *main*: soft cross-entropy between the softmax over the score-weighted
    mixture of (transformed) frame features and the softmax of the video-level
    embedding (simnet_pretrain.py:95-99, 35-41);
(b) *center*: entropy of the sharpened score distribution
    (``sharpening_t=0.4``, :43-47, 84-94);
(c) *repel*: mean off-diagonal cosine similarity between transformed frame
    features (:49-69).

The driver combines them as ``main + 0.5*center + 1.0*repel``
(``src/pretrain.py:63``) with the weights promoted to config.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vidsum_tpu.config import ModelConfig, PretrainConfig
from vidsum_tpu.models.simnet import _init_linear, _linear, init_simnet, simnet_apply
from vidsum_tpu.ops.losses import (
    entropy_centering, reference_pad_len, repelling_loss, soft_cross_entropy,
)

Params = Dict[str, Any]

VIDEO_REP_DIM = 512  # R3D-18 embedding dim (simnet_pretrain.py:33)


def init_pretrain_model(key, model_cfg: ModelConfig) -> Params:
    k_enc, k_vt = jax.random.split(key)
    return {
        "encoder": init_simnet(k_enc, model_cfg),
        "video_transform": _init_linear(k_vt, model_cfg.d_model, VIDEO_REP_DIM),
    }


def pretrain_apply(params: Params, model_cfg: ModelConfig,
                   pretrain_cfg: PretrainConfig,
                   x: jnp.ndarray, video_rep: jnp.ndarray,
                   pad_mask: Optional[jnp.ndarray] = None, *,
                   rng=None, deterministic: bool = True,
                   attn_impl: str = "xla",
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (main_loss, center_loss, repel_loss).

    :param x: (B, N, 1024) frame features.
    :param video_rep: (B, 512) frozen R3D-18 video embeddings.
    :param pad_mask: (B, N) bool, True at padded frames.
    """
    scores, frame_features = simnet_apply(
        params["encoder"], model_cfg, x, pad_mask,
        rng=rng, deterministic=deterministic, model_score=True,
        attn_impl=attn_impl)
    frame_features = _linear(params["video_transform"],
                             frame_features.astype(jnp.float32))

    # center/repel divide by the REFERENCE pad length (max true length in
    # the batch), not our bucket width — see ops/losses.py module docstring
    ref_len = reference_pad_len(pad_mask, x.shape[1])
    repel = repelling_loss(frame_features, pad_mask, denom_len=ref_len)

    if pad_mask is not None:
        scores = jnp.where(pad_mask[..., None], -jnp.inf, scores)
    mixture = jax.nn.softmax(scores / pretrain_cfg.sharpening_t, axis=1)
    center = entropy_centering(mixture + 1e-9, pad_mask, denom_len=ref_len)

    # (B, 1, N) @ (B, N, 512) → (B, 512): score-weighted feature mixture
    video_rep_pred = jnp.einsum("bnc,bnd->bcd", mixture,
                                frame_features).squeeze(1)
    main = soft_cross_entropy(video_rep_pred, video_rep)
    return main, center, repel
