"""Sharded training steps: dp×tp over a (data, model) mesh via jax.jit with
explicit in/out shardings (GSPMD).

The only collective parity requires is the gradient all-reduce over ``data``
(SURVEY.md §5); the tensor-parallel axis additionally all-reduces the
row-parallel matmul partials inside each block. Both are emitted by XLA from
the sharding annotations — this module contains no explicit collectives.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from vidsum_tpu.config import ModelConfig, PretrainConfig
from vidsum_tpu.models.pretrain import pretrain_apply
from vidsum_tpu.models.simnet import simnet_apply
from vidsum_tpu.ops.losses import mse_with_mask_loss
from vidsum_tpu.parallel.sharding import (
    batch_sharding, param_shardings, replicate,
)


def make_sharded_finetune_step(cfg: ModelConfig,
                               optimizer: optax.GradientTransformation,
                               mesh: Mesh, attn_impl: str = "xla",
                               seq_axis: str = None,
                               ) -> Tuple[Callable, Callable]:
    """Returns ``(init_fn, step_fn)``.

    ``init_fn(params)`` places params + fresh opt state onto the mesh.
    ``step_fn(params, opt_state, x, target, pad_mask, rng)`` is jitted with
    dp×tp shardings; inputs may arrive as host arrays (jit moves them per the
    declared in_shardings).

    ``seq_axis`` composes a THIRD mesh axis: the sequence dimension of the
    batch is additionally sharded over it (x → P(data, seq, None)), so one
    train step runs data×seq×model on a single 3-axis mesh — GSPMD inserts
    the softmax/matmul collectives for the N-sharded dense attention.
    Equality with the single-device step is pinned by
    ``tests/test_parallel.py`` (dropout 0 exactly; dropout>0 bit-equal under
    the partitionable threefry) and dryrun[h].
    """
    p_shard = None  # bound at init (needs the param structure)
    rep = replicate(mesh)

    def batch_spec(ndim):
        from jax.sharding import NamedSharding
        if seq_axis is None:
            return batch_sharding(mesh, ndim)
        return NamedSharding(
            mesh, P(*(("data", seq_axis) + (None,) * (ndim - 2))))

    def init_fn(params):
        nonlocal p_shard
        p_shard = param_shardings(params, mesh)
        params = jax.device_put(params, p_shard)
        opt_state = jax.jit(
            optimizer.init,
            out_shardings=jax.tree_util.tree_map(
                lambda _: rep, jax.eval_shape(optimizer.init, params),
                is_leaf=lambda x: isinstance(x, jax.ShapeDtypeStruct)),
        )(params)
        return params, opt_state

    def loss_fn(params, x, target, pad_mask, rng, item_weight):
        scores, _ = simnet_apply(params, cfg, x, pad_mask, rng=rng,
                                 deterministic=False, attn_impl=attn_impl)
        return mse_with_mask_loss(scores, target, pad_mask,
                                  item_weight=item_weight)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step_fn(params, opt_state, x, target, pad_mask, rng,
                item_weight=None):
        x = jax.lax.with_sharding_constraint(x, batch_spec(3))
        target = jax.lax.with_sharding_constraint(target, batch_spec(2))
        pad_mask = jax.lax.with_sharding_constraint(pad_mask, batch_spec(2))
        if item_weight is not None:
            item_weight = jax.lax.with_sharding_constraint(
                item_weight, batch_sharding(mesh, 1))
        loss, grads = jax.value_and_grad(loss_fn)(params, x, target,
                                                  pad_mask, rng, item_weight)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return init_fn, step_fn


def make_sharded_pretrain_step(model_cfg: ModelConfig,
                               pretrain_cfg: PretrainConfig,
                               optimizer: optax.GradientTransformation,
                               mesh: Mesh) -> Tuple[Callable, Callable]:
    """dp×tp pretraining step (same contract as the finetune variant)."""

    rep = replicate(mesh)

    def init_fn(params):
        p_shard = param_shardings(params, mesh)
        params = jax.device_put(params, p_shard)
        opt_state = jax.jit(
            optimizer.init,
            out_shardings=jax.tree_util.tree_map(
                lambda _: rep, jax.eval_shape(optimizer.init, params),
                is_leaf=lambda x: isinstance(x, jax.ShapeDtypeStruct)),
        )(params)
        return params, opt_state

    def loss_fn(params, x, video_rep, pad_mask, rng):
        main, center, repel = pretrain_apply(
            params, model_cfg, pretrain_cfg, x, video_rep, pad_mask,
            rng=rng, deterministic=False)
        total = (main + pretrain_cfg.center_weight * center
                 + pretrain_cfg.repel_weight * repel)
        return total, (main, center, repel)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step_fn(params, opt_state, x, video_rep, pad_mask, rng):
        x = jax.lax.with_sharding_constraint(x, batch_sharding(mesh, 3))
        video_rep = jax.lax.with_sharding_constraint(
            video_rep, batch_sharding(mesh, 2))
        pad_mask = jax.lax.with_sharding_constraint(
            pad_mask, batch_sharding(mesh, 2))
        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, x, video_rep, pad_mask, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        if pretrain_cfg.freeze_video_transform:
            updates = dict(updates)
            updates["video_transform"] = jax.tree_util.tree_map(
                jnp.zeros_like, updates["video_transform"])
        params = optax.apply_updates(params, updates)
        return params, opt_state, (total,) + aux

    return init_fn, step_fn
