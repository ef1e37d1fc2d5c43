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

Training uses the same layout (:func:`make_pp_train_step`): block weights
AND their Adam state shard over ``stage`` (ZeRO-style — per-device optimizer
memory drops by the stage count), the batch is data-parallel over the same
devices, and the backward of each layer's all_gather is automatically the
psum-scatter of that layer's gradient back to its owner stage — no hand
-written grad communication. There is no microbatch bubble to schedule
because no activations ever cross devices; this is the measured reason the
GPipe alternative lost (weights ~0.8 MB/block vs B×N×d activations/
microbatch at flagship shape — see PERF.md "Pipeline-parallel training").
(No reference analogue; the reference is single-GPU, SURVEY.md §2.6.)
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
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


def make_pp_train_step(cfg: ModelConfig,
                       optimizer: optax.GradientTransformation,
                       mesh: Mesh, stage_axis: str = "stage"
                       ) -> Tuple[Any, Any]:
    """Weight-streaming pipeline TRAINING: returns ``(init_fn, step_fn)``.

    ``init_fn(params)`` → pp state: embed/head replicated, blocks stacked
    with the leading layer axis sharded over ``stage``, and the optimizer
    state in the same layout (block moments live only on the owner stage).
    ``step_fn(state, x, target, pad_mask, rng)`` → ``(state, loss)`` with
    the batch sharded over ``stage`` (dp) and one all_gather per layer per
    pass; the gradient of that gather IS the reduce-scatter of the layer
    grad back to its owner (handled by autodiff, no explicit collective).
    """
    from vidsum_tpu.models.simnet import (
        _attention, _dropout, _layernorm, _linear, _mlp,
        positional_encoding_table,
    )
    from vidsum_tpu.ops.losses import mse_with_mask_loss

    n_stages = mesh.shape[stage_axis]
    if cfg.num_layers % n_stages:
        raise ValueError(f"{cfg.num_layers} layers not divisible by "
                         f"{n_stages} stages")
    if cfg.use_cls:
        raise ValueError("pipeline training does not support CLS tokens")
    per_stage = cfg.num_layers // n_stages

    def block_specs(stacked):
        return jax.tree_util.tree_map(lambda _: P(stage_axis), stacked)

    def init_fn(params):
        from jax.sharding import NamedSharding

        stacked = stack_blocks(params)
        pp_params = {"embed": params["embed"], "blocks": stacked,
                     "head": params["head"]}
        shardings = {
            "embed": jax.tree_util.tree_map(
                lambda _: NamedSharding(mesh, P()), params["embed"]),
            "blocks": jax.tree_util.tree_map(
                lambda _: NamedSharding(mesh, P(stage_axis)), stacked),
            "head": jax.tree_util.tree_map(
                lambda _: NamedSharding(mesh, P()), params["head"]),
        }
        pp_params = jax.device_put(pp_params, shardings)
        # zeros_like inherits each param's sharding: Adam moments for the
        # blocks live only on their owner stage (the ZeRO property)
        opt_state = optimizer.init(pp_params)
        return pp_params, opt_state

    def forward(embed, blocks_shard, head, x, pad_mask, rng, deterministic):
        compute_dtype = jnp.dtype(cfg.compute_dtype)
        h = _linear(embed, x.astype(compute_dtype))
        if cfg.use_pos:
            pe = positional_encoding_table(max(cfg.max_len, x.shape[1]),
                                           cfg.d_model)
            h = h + pe[None, : x.shape[1]].astype(compute_dtype)
        for layer in range(cfg.num_layers):
            owner, local_idx = divmod(layer, per_stage)
            block = jax.tree_util.tree_map(
                lambda a: jax.lax.all_gather(a[local_idx],
                                             stage_axis)[owner],
                blocks_shard)
            if rng is not None:
                rng, r_attn, r_d1, r_mlp, r_d2 = jax.random.split(rng, 5)
            else:
                r_attn = r_d1 = r_mlp = r_d2 = None
            sa, _ = _attention(block["attn"], h, pad_mask, cfg, r_attn,
                               deterministic, False, "xla")
            h = _layernorm(block["ln1"],
                           _dropout(sa, cfg.dropout, r_d1, deterministic) + h)
            ff = _mlp(block["mlp"], h, cfg, r_mlp, deterministic)
            h = _layernorm(block["ln2"],
                           _dropout(ff, cfg.dropout, r_d2, deterministic) + h)
        return _linear(head, h).astype(jnp.float32)

    def local_step(params, opt_state, x, target, pad_mask, rng):
        if rng is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(stage_axis))
        # reference pad length of the GLOBAL batch (the stage axis doubles
        # as dp here) — see ops/losses.py module docstring
        from vidsum_tpu.ops.losses import reference_pad_len
        denom_len = jax.lax.pmax(reference_pad_len(pad_mask, x.shape[1]),
                                 stage_axis)

        def loss_fn(p):
            scores = forward(p["embed"], p["blocks"], p["head"], x, pad_mask,
                             rng, deterministic=cfg.dropout == 0.0)
            return mse_with_mask_loss(scores, target, pad_mask,
                                      denom_len=denom_len)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # replicated leaves: average over the (data-parallel) stage axis;
        # sharded block grads arrive as the SUM over devices from the
        # all_gather VJP's psum-scatter — rescale to the same mean.
        grads["embed"] = jax.tree_util.tree_map(
            lambda g: jax.lax.pmean(g, stage_axis), grads["embed"])
        grads["head"] = jax.tree_util.tree_map(
            lambda g: jax.lax.pmean(g, stage_axis), grads["head"])
        grads["blocks"] = jax.tree_util.tree_map(
            lambda g: g / n_stages, grads["blocks"])
        loss = jax.lax.pmean(loss, stage_axis)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def _opt_specs(opt_state, p_spec, params_treedef):
        """Optimizer-state specs: any sub-tree that mirrors the params
        structure (Adam mu/nu, wd state) gets the param specs; scalar
        bookkeeping (step counts) is replicated."""
        def rec(s):
            try:
                if jax.tree_util.tree_structure(s) == params_treedef:
                    return p_spec
            except Exception:
                pass
            if hasattr(s, "_fields"):            # namedtuple state
                return type(s)(*[rec(f) for f in s])
            if isinstance(s, (tuple, list)):
                return type(s)(rec(f) for f in s)
            if isinstance(s, dict):
                return {k: rec(v) for k, v in s.items()}
            return P()
        return rec(opt_state)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step_fn(pp_params, opt_state, x, target, pad_mask, rng):
        p_spec = {"embed": jax.tree_util.tree_map(lambda _: P(),
                                                  pp_params["embed"]),
                  "blocks": block_specs(pp_params["blocks"]),
                  "head": jax.tree_util.tree_map(lambda _: P(),
                                                 pp_params["head"])}
        o_spec = _opt_specs(opt_state, p_spec,
                            jax.tree_util.tree_structure(pp_params))
        return jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(p_spec, o_spec, P(stage_axis, None, None),
                      P(stage_axis, None), P(stage_axis, None), P()),
            out_specs=(p_spec, o_spec, P()),
            check_vma=False,
        )(pp_params, opt_state, x, target, pad_mask, rng)

    return init_fn, step_fn
