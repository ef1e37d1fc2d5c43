"""Sequence-parallel scorer forward: the full SimNet over a (data, seq) mesh.

For the raw-video stretch config (frame counts far beyond the 2.5k-frame
dense envelope), the sequence axis itself is sharded: every position-wise op
(embedding, LN, MLP, head) runs locally on each shard, positional encodings
are indexed at each shard's global offset, and attention runs as exact
ring attention (``parallel/ring_attention.py``) with K/V rotating over ICI.
Activations per device scale as O(N/P) and no N×N tensor ever exists.

No reference analogue — the reference's PE table caps sequences at 2000
frames on a single GPU (``src/model/simnet.py:188,224``).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from vidsum_tpu.config import ModelConfig
from vidsum_tpu.models.simnet import simnet_apply
from vidsum_tpu.parallel.ring_attention import (
    hash_keep3d, ring_attention, ring_attention_train,
)

__all__ = ["hash_keep3d", "make_seq_sharded_finetune_step",
           "make_seq_sharded_forward"]


def make_seq_sharded_forward(cfg: ModelConfig, mesh: Mesh,
                             seq_axis: str = "seq",
                             data_axis: str = "data"):
    """Jitted ``fwd(params, x, pad_mask) -> (scores, hidden)`` with ``x``
    (B, N, D) sharded over (data, seq). Deterministic (inference) path;
    requires ``use_cls=False`` (the flagship config)."""
    if cfg.use_cls:
        raise ValueError("sequence-parallel forward does not support CLS "
                         "tokens (per-shard prepend would corrupt the ring)")

    n_seq = mesh.shape[seq_axis]

    def local_forward(params, x, pad_mask):
        # x: (B, Nl, D) local shard; global offset from the mesh coordinate
        shard_idx = jax.lax.axis_index(seq_axis)
        offset = shard_idx * x.shape[1]
        attn = functools.partial(ring_attention, scale=cfg.attn_scale,
                                 axis_name=seq_axis)
        # PE table must cover the GLOBAL sequence, not the local shard
        return simnet_apply(params, cfg, x, pad_mask, deterministic=True,
                            attn_fn=attn, pos_offset=offset,
                            pe_len=n_seq * x.shape[1])

    @jax.jit
    def fwd(params, x, pad_mask):
        return jax.shard_map(
            local_forward,
            mesh=mesh,
            in_specs=(P(), P(data_axis, seq_axis, None),
                      P(data_axis, seq_axis)),
            out_specs=(P(data_axis, seq_axis, None),
                       P(data_axis, seq_axis, None)),
            check_vma=False,  # ring's pallas step outputs carry no vma type
        )(params, x, pad_mask)


    return fwd


def make_seq_sharded_finetune_step(cfg: ModelConfig,
                                   optimizer: optax.GradientTransformation,
                                   mesh: Mesh,
                                   seq_axis: str = "seq",
                                   data_axis: str = "data",
                                   block_impl: str = "auto"):
    """Sequence-parallel TRAINING: jitted ``step(params, opt_state, x,
    target, pad_mask, rng) -> (params, opt_state, loss)`` with the batch
    over ``data`` and the sequence over ``seq`` — masked-MSE finetuning of
    videos whose length exceeds single-device memory.

    Design (greenfield, no reference analogue — the reference trains dense
    single-GPU attention, ``src/model/simnet.py:148-163``):

    - attention is :func:`ring_attention_train`. ``block_impl='pallas'``
      (auto on TPU, supported shapes) runs the custom-VJP fused ring: both
      the forward and the flash-style backward are per-step Pallas kernels,
      so the (Nl, Nl) score block never touches HBM in training either;
      ``'xla'`` is the einsum ring with per-step ``jax.checkpoint``. Both
      keep activation memory O(N/P·D);
    - ALL dropout sites draw coordinate-absolute hash masks (attention
      weights inside the ring; res1/mlp/res2 via ``dropout_masks`` +
      :func:`hash_keep3d`), so the realized masks — and therefore the loss
      and gradients — are invariant to the mesh shape and bit-comparable to
      a dense single-device replay applying the same masks
      (tests/test_seq_train.py);
    - params and optimizer state stay replicated; gradients ``pmean`` over
      BOTH mesh axes (cross-shard terms arrive through the VJP of the
      ring's ``ppermute``), which equals the gradient of the global
      batch-mean loss because all shards are equal-sized.
    """
    if cfg.use_cls:
        raise ValueError("sequence-parallel training does not support CLS "
                         "tokens")
    if cfg.pos_dropout:
        raise ValueError("pos_dropout > 0 is not wired for the seq-sharded "
                         "step (0.0 in every reference recipe)")
    from vidsum_tpu.ops.block_train import (
        MAX_HASH_HEADS, S_MLP, S_RES1, S_RES2,
    )
    from vidsum_tpu.ops.losses import mse_with_mask_loss

    if cfg.num_heads > MAX_HASH_HEADS:
        # the ring's attention sites are the raw head indices; heads >= 32
        # would collide with S_RES1/S_MLP/S_RES2 (same guard as the fused
        # kernels, ops/block_train.py)
        raise ValueError(f"num_heads {cfg.num_heads} > {MAX_HASH_HEADS} "
                         "collides with the residual/MLP dropout sites")

    n_seq = mesh.shape[seq_axis]
    L = cfg.num_layers
    hid = cfg.d_model * cfg.mlp_scale

    def local_step(params, opt_state, x, target, pad_mask, rng):
        Bl, Nl, _ = x.shape
        row0 = jax.lax.axis_index(seq_axis) * Nl
        b0 = jax.lax.axis_index(data_axis) * Bl
        # per-layer seeds from the UNfolded rng: identical on every shard,
        # so ring partners agree on every mask bit
        seeds = jax.random.randint(rng, (L,), 0, 2 ** 31 - 1, jnp.int32)
        # reference pad length of the GLOBAL batch (ops/losses.py): true
        # lengths need a psum over the sequence shards, then a max over the
        # global batch
        lengths = jax.lax.psum(jnp.sum(~pad_mask, axis=1), seq_axis)
        denom_len = jax.lax.pmax(jnp.max(lengths).astype(jnp.float32),
                                 data_axis)
        B_glob = Bl * mesh.shape[data_axis]

        def loss_fn(params):
            calls = [0]  # simnet's layer loop is a Python loop → one
                         # attn_fn call per layer at trace time

            def attn_fn(q, k, v, pm):
                li = calls[0] % L
                calls[0] += 1
                return ring_attention_train(q, k, v, pm, cfg.attn_scale,
                                            seq_axis, seeds[li],
                                            cfg.dropout, b0=b0,
                                            block_impl=block_impl)

            masks = [{
                "attn": None,  # handled inside the ring
                "res1": hash_keep3d(seeds[li], S_RES1, b0, row0,
                                    (Bl, Nl, cfg.d_model), cfg.dropout),
                "mlp": hash_keep3d(seeds[li], S_MLP, b0, row0,
                                   (Bl, Nl, hid), cfg.dropout),
                "res2": hash_keep3d(seeds[li], S_RES2, b0, row0,
                                    (Bl, Nl, cfg.d_model), cfg.dropout),
            } for li in range(L)]
            scores, _ = simnet_apply(params, cfg, x, pad_mask,
                                     deterministic=False, attn_fn=attn_fn,
                                     pos_offset=row0, pe_len=n_seq * Nl,
                                     dropout_masks=masks)
            # each shard holds a (Bl, Nl) tile of the global (B, N) loss
            # grid, so its correctly-scaled contribution is its raw sum over
            # the GLOBAL denominator — psum (not pmean) then recovers the
            # global batch-mean loss and its exact gradient
            local_sum = mse_with_mask_loss(scores, target, pad_mask,
                                           reduction="sum")
            return local_sum / (B_glob * denom_len)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, (data_axis, seq_axis)), grads)
        loss = jax.lax.psum(loss, (data_axis, seq_axis))
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, x, target, pad_mask, rng):
        return jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(P(), P(), P(data_axis, seq_axis, None),
                      P(data_axis, seq_axis), P(data_axis, seq_axis), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,  # optimizer updates are replicated-safe
        )(params, opt_state, x, target, pad_mask, rng)

    return step
