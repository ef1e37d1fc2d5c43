"""Pipeline parallelism over encoder layers — weight-streaming schedule.

Layer memory shards over a ``stage`` mesh axis: each device owns
``num_layers / S`` encoder blocks (stacked pytree, leading axis sharded).
At run time the batch is data-parallel over the same devices and, for each
layer in order, the owning stage's block weights are streamed to all devices
(one ICI all-gather per layer) and applied locally.

Why weight-streaming instead of GPipe activation-passing: at SimNet scale a
block's weights (~0.8 MB bf16 at d=256) are far smaller than a microbatch's
activations (B×N×d), so rotating weights costs less ICI traffic than
rotating activations, there is no pipeline bubble, and per-device parameter
memory still drops by the stage count — the property pipeline parallelism
exists to deliver. (No reference analogue; the reference is single-GPU,
SURVEY.md §2.6.)

Used for inference/serving of deep scorer variants; training stays dp×tp
(``parallel/train_parallel.py``), which is the right layout at ≤4 layers.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vidsum_tpu.config import ModelConfig


def stack_blocks(params: Dict[str, Any]) -> Dict[str, Any]:
    """blocks: list of L dicts → one pytree with leading layer axis L."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                  *params["blocks"])


def make_pp_forward(cfg: ModelConfig, mesh: Mesh, stage_axis: str = "stage"):
    """Jitted ``fwd(params, x, pad_mask) -> scores`` with encoder blocks
    sharded over ``stage_axis`` and the batch data-parallel over it."""
    n_stages = mesh.shape[stage_axis]
    if cfg.num_layers % n_stages:
        raise ValueError(f"{cfg.num_layers} layers not divisible by "
                         f"{n_stages} stages")
    if cfg.use_cls:
        raise ValueError("pipeline forward does not support CLS tokens")
    per_stage = cfg.num_layers // n_stages

    from vidsum_tpu.models.simnet import (
        _attention, _layernorm, _linear, _mlp, positional_encoding_table,
    )

    def apply_block(block, h, pad_mask):
        sa, _ = _attention(block["attn"], h, pad_mask, cfg, None, True,
                           False, "xla")
        h = _layernorm(block["ln1"], sa + h)
        ff = _mlp(block["mlp"], h, cfg, None, True)
        return _layernorm(block["ln2"], ff + h)

    def local_forward(embed, stage_blocks, head, x, pad_mask):
        # x: (B/S, N, D) local batch shard; stage_blocks: (per_stage, ...)
        compute_dtype = jnp.dtype(cfg.compute_dtype)
        h = _linear(embed, x.astype(compute_dtype))
        if cfg.use_pos:
            pe = positional_encoding_table(max(cfg.max_len, x.shape[1]),
                                           cfg.d_model)
            h = h + pe[None, : x.shape[1]].astype(compute_dtype)
        for layer in range(cfg.num_layers):
            owner, local_idx = divmod(layer, per_stage)
            # stream the owner's block to every device (one gather per layer)
            gathered = jax.tree_util.tree_map(
                lambda a: jax.lax.all_gather(
                    a[local_idx], stage_axis)[owner],
                stage_blocks)
            h = apply_block(gathered, h, pad_mask)
        return _linear(head, h).astype(jnp.float32)

    @jax.jit
    def fwd(params, x, pad_mask):
        stacked = stack_blocks(params)
        specs_blocks = jax.tree_util.tree_map(lambda _: P(stage_axis),
                                              stacked)
        return jax.shard_map(
            local_forward,
            mesh=mesh,
            in_specs=(P(), specs_blocks, P(), P(stage_axis, None, None),
                      P(stage_axis, None)),
            out_specs=P(stage_axis, None, None),
        )(params["embed"], stacked, params["head"], x, pad_mask)

    return fwd
