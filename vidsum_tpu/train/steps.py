"""Jitted train/eval steps.

TPU-native replacements for the reference's eager loops:
- finetune step (reference ``src/train.py:111-131``): masked-MSE over raw
  logits, Adam with torch-style coupled weight decay (``train.py:35-36``).
  The whole fwd+bwd+update is one XLA program; there is no GradScaler —
  bf16 has fp32 exponent range, so the fp16-AMP machinery the reference
  needs (``train.py:38``) has no TPU analogue.
- eval forward (reference ``src/train.py:134-152``): sigmoid scores + MSE.
- pretrain step (reference ``src/pretrain.py:54-70``): 3-loss objective with
  config loss weights, optionally freezing ``video_transform`` like the
  reference's encoder-only optimizer (``pretrain.py:35``).

Each factory closes over static config and returns a ``jax.jit``-ed function;
donated arguments keep params/opt-state in place in HBM.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from vidsum_tpu.config import ModelConfig, PretrainConfig
from vidsum_tpu.models.pretrain import pretrain_apply
from vidsum_tpu.models.simnet import simnet_apply
from vidsum_tpu.ops.losses import mse_with_mask_loss


def make_optimizer(lr, weight_decay: float = 0.0) -> optax.GradientTransformation:
    """Adam with torch-style *coupled* weight decay (grad += wd·param before
    the moment updates), matching ``torch.optim.Adam(weight_decay=…)``.
    ``lr`` may be a float or an optax schedule."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.adam(lr))
    return optax.chain(*parts)


def make_finetune_step(cfg: ModelConfig, optimizer: optax.GradientTransformation,
                       attn_impl: str = "xla") -> Callable:
    """Returns jitted ``step(params, opt_state, x, target, pad_mask, rng) ->
    (params, opt_state, loss)``."""

    def loss_fn(params, x, target, pad_mask, rng, item_weight):
        scores, _ = simnet_apply(params, cfg, x, pad_mask, rng=rng,
                                 deterministic=False, attn_impl=attn_impl)
        return mse_with_mask_loss(scores, target, pad_mask,
                                  item_weight=item_weight)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, x, target, pad_mask, rng, item_weight=None):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, target, pad_mask,
                                                  rng, item_weight)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_eval_forward(cfg: ModelConfig, attn_impl: str = "xla") -> Callable:
    """Returns jitted ``fwd(params, x, pad_mask) -> sigmoid scores (B, N)``
    (reference applies sigmoid only at val time, train.py:144)."""

    @jax.jit
    def fwd(params, x, pad_mask):
        scores, _ = simnet_apply(params, cfg, x, pad_mask,
                                 deterministic=True, attn_impl=attn_impl)
        return jax.nn.sigmoid(scores[..., 0])

    return fwd


def make_pretrain_step(model_cfg: ModelConfig, pretrain_cfg: PretrainConfig,
                       optimizer: optax.GradientTransformation,
                       attn_impl: str = "xla") -> Callable:
    """Returns jitted ``step(params, opt_state, x, video_rep, pad_mask, rng)
    -> (params, opt_state, (total, main, center, repel))``.

    When ``pretrain_cfg.freeze_video_transform`` (the reference's
    encoder-only Adam, pretrain.py:35), video_transform grads are zeroed so
    that subtree keeps its init values — same effect, one pytree.
    """

    def loss_fn(params, x, video_rep, pad_mask, rng):
        main, center, repel = pretrain_apply(
            params, model_cfg, pretrain_cfg, x, video_rep, pad_mask,
            rng=rng, deterministic=False, attn_impl=attn_impl)
        total = (main + pretrain_cfg.center_weight * center
                 + pretrain_cfg.repel_weight * repel)
        return total, (main, center, repel)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, x, video_rep, pad_mask, rng):
        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, x, video_rep, pad_mask, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        if pretrain_cfg.freeze_video_transform:
            # zero the *updates* (not just grads) so coupled weight decay
            # can't touch the frozen subtree either — it must keep its init
            # values exactly, like the reference's encoder-only optimizer.
            updates = dict(updates)
            updates["video_transform"] = jax.tree_util.tree_map(
                jnp.zeros_like, updates["video_transform"])
        params = optax.apply_updates(params, updates)
        return params, opt_state, (total,) + aux

    return step
