"""Data-parallel training via shard_map — the multi-chip path that keeps the
fused Pallas kernels.

The GSPMD-based dp×tp step (``train_parallel.py``) lets XLA partition a
plain-XLA graph, but GSPMD cannot partition a ``pallas_call``, so that step
runs the dense attention path. Here the *program* is manually sharded
instead: every device runs the identical local train computation on its
batch shard — including the fused dropout-attention kernel — and gradients
are ``psum``-averaged over the ``data`` axis (the one collective parity
requires, SURVEY.md §2.6). Params and optimizer state stay replicated, so
checkpoints are layout-free.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import optax
from jax.sharding import Mesh, PartitionSpec as P

from vidsum_tpu.config import ModelConfig
from vidsum_tpu.models.simnet import simnet_apply
from vidsum_tpu.ops.losses import mse_with_mask_loss, reference_pad_len


def make_dp_shardmap_finetune_step(cfg: ModelConfig,
                                   optimizer: optax.GradientTransformation,
                                   mesh: Mesh, attn_impl: str = "pallas_block",
                                   data_axis: str = "data") -> Callable:
    """Jitted ``step(params, opt_state, x, target, pad_mask, rng) ->
    (params, opt_state, loss)`` with the batch sharded over ``data_axis`` and
    the fused kernels running per shard.

    The per-device dropout stream is decorrelated by folding in the device's
    axis index; the returned loss is the global (batch-mean) loss.
    """

    def loss_fn(params, x, target, pad_mask, rng, denom_len):
        scores, _ = simnet_apply(params, cfg, x, pad_mask, rng=rng,
                                 deterministic=False, attn_impl=attn_impl)
        return mse_with_mask_loss(scores, target, pad_mask,
                                  denom_len=denom_len)

    def local_step(params, opt_state, x, target, pad_mask, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))
        # reference pad length of the GLOBAL batch (ops/losses.py docstring):
        # each shard sees only its rows, so pmax the local max true length
        denom_len = jax.lax.pmax(reference_pad_len(pad_mask, x.shape[1]),
                                 data_axis)
        loss, grads = jax.value_and_grad(loss_fn)(params, x, target,
                                                  pad_mask, rng, denom_len)
        # the only collective: average grads (and the scalar loss) over data
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.pmean(g, data_axis), grads)
        loss = jax.lax.pmean(loss, data_axis)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def weighted_loss_fn(params, x, target, pad_mask, rng, w, denom):
        scores, _ = simnet_apply(params, cfg, x, pad_mask, rng=rng,
                                 deterministic=False, attn_impl=attn_impl)
        local_sum = mse_with_mask_loss(scores, target, pad_mask,
                                       reduction="sum", item_weight=w)
        return local_sum / denom

    def local_step_weighted(params, opt_state, x, target, pad_mask, rng, w):
        """Padded-final-batch variant: the global loss is the weighted sum
        over every shard divided by ``sum(w_global)·reference_pad_len`` —
        exactly the smaller final batch's mean — so local losses/grads are
        *psum*-med, not averaged."""
        rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))
        denom = (jax.lax.psum(w.sum(), data_axis)
                 * jax.lax.pmax(reference_pad_len(pad_mask, x.shape[1]),
                                data_axis))
        loss, grads = jax.value_and_grad(weighted_loss_fn)(
            params, x, target, pad_mask, rng, w, denom)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, data_axis), grads)
        loss = jax.lax.psum(loss, data_axis)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, x, target, pad_mask, rng, item_weight=None):
        if item_weight is None:
            return jax.shard_map(
                local_step,
                mesh=mesh,
                in_specs=(P(), P(), P(data_axis, None, None),
                          P(data_axis, None), P(data_axis, None), P()),
                out_specs=(P(), P(), P()),
                check_vma=False,  # opt state updates are replicated-safe
            )(params, opt_state, x, target, pad_mask, rng)
        return jax.shard_map(
            local_step_weighted,
            mesh=mesh,
            in_specs=(P(), P(), P(data_axis, None, None), P(data_axis, None),
                      P(data_axis, None), P(), P(data_axis)),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )(params, opt_state, x, target, pad_mask, rng, item_weight)

    return step
