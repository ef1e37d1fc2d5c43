"""SimNet — the transformer frame-importance scorer, as pure JAX functions
over an explicit parameter pytree.

Behavior contract (reference: ``src/model/simnet.py``):
- Linear embed 1024→d_model + sinusoidal positional encoding (+ optional CLS
  token) → ``num_layers`` post-LN transformer encoder blocks → Linear head
  d_model→num_classes. Forward returns ``(scores, hidden)``.
- Attention scale is ``d_model**-0.5`` (simnet.py:126), padding mask is a
  *key* mask broadcast over heads and queries (simnet.py:47-56,156-157),
  dropout sits on attention weights, post-activation MLP, and residuals are
  ``LN(dropout(sub(x)) + x)`` (post-LN, simnet.py:108-111).
- The reference Encoder's 2-block "score head" is dead code (an empty
  ModuleList, simnet.py:66-75), so ``forward`` returns ``(x, x)`` — we build
  the plain L-layer encoder and mirror the ``(scores, hidden)`` /
  ``model_score`` return contract.
- Dropped on purpose: the per-layer ``attn.detach().cpu()`` host sync
  (simnet.py:164) — pure overhead; attention maps are returned only on
  request and stay on device.

TPU notes: the whole forward is a single XLA program under ``jax.jit`` —
batched (B, N, D) matmuls land on the MXU; masking/softmax/dropout fuse into
the surrounding ops. An optional Pallas fused-attention path lives in
``vidsum_tpu.ops.attention`` and is selected via ``attn_impl='pallas'``.
Params stay float32; set ``ModelConfig.compute_dtype='bfloat16'`` to run the
matmul path in bf16 (the TPU replacement for the reference's fp16 AMP).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from vidsum_tpu.config import ModelConfig

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Initialization (matches torch.nn.Linear's U(±1/√fan_in) for both w and b,
# so training dynamics start from the same distribution as the reference).
# ---------------------------------------------------------------------------

def _init_linear(key, in_dim: int, out_dim: int) -> Params:
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    return {
        "w": jax.random.uniform(kw, (in_dim, out_dim), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (out_dim,), jnp.float32, -bound, bound),
    }


def _init_layernorm(dim: int) -> Params:
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def _init_block(key, cfg: ModelConfig) -> Params:
    keys = jax.random.split(key, 6)
    d = cfg.d_model
    return {
        "attn": {
            "q": _init_linear(keys[0], d, d),
            "k": _init_linear(keys[1], d, d),
            "v": _init_linear(keys[2], d, d),
            "proj": _init_linear(keys[3], d, d),
        },
        "mlp": {
            "fc1": _init_linear(keys[4], d, cfg.mlp_scale * d),
            "fc2": _init_linear(keys[5], cfg.mlp_scale * d, d),
        },
        "ln1": _init_layernorm(d),
        "ln2": _init_layernorm(d),
    }


def init_simnet(key, cfg: ModelConfig) -> Params:
    keys = jax.random.split(key, cfg.num_layers + 3)
    params: Params = {
        "embed": _init_linear(keys[0], cfg.in_features, cfg.d_model),
        "blocks": [_init_block(keys[i + 1], cfg) for i in range(cfg.num_layers)],
        "head": _init_linear(keys[cfg.num_layers + 1], cfg.d_model, cfg.num_classes),
    }
    if cfg.use_cls:
        params["cls"] = jnp.zeros((1, 1, cfg.d_model))
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def positional_encoding_table(max_len: int, d_model: int) -> jnp.ndarray:
    """Classic sin/cos table (reference: simnet.py:220-234)."""
    angle = jnp.exp(-jnp.arange(0, d_model, 2) * math.log(10000.0) / d_model)
    pos = jnp.arange(0, max_len, dtype=jnp.float32)[:, None]
    pe = jnp.zeros((max_len, d_model))
    pe = pe.at[:, 0::2].set(jnp.sin(pos * angle))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * angle))
    return pe


def _linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(x, p["w"].astype(x.dtype)) + p["b"].astype(x.dtype)


def _layernorm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    # match torch LayerNorm: normalize in fp32, biased variance
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * p["scale"] + p["bias"]).astype(x.dtype)


def _dropout(x: jnp.ndarray, rate: float, rng, deterministic: bool) -> jnp.ndarray:
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def _apply_keep(x: jnp.ndarray, keep_mask, rate: float) -> jnp.ndarray:
    """Dropout with an externally supplied boolean keep mask (used by the
    cross-framework lockstep parity tests to feed bit-identical masks here
    and into a torch mirror)."""
    if rate == 0.0:
        return x
    return jnp.where(keep_mask, x / (1.0 - rate), 0.0).astype(x.dtype)


def _attention(p: Params, x: jnp.ndarray, pad_mask, cfg: ModelConfig,
               rng, deterministic: bool, return_weights: bool,
               attn_impl: str, attn_fn=None, attn_keep=None):
    """Multi-head self-attention (reference: simnet.py:117-164)."""
    B, N, _ = x.shape
    H, Dh = cfg.num_heads, cfg.head_dim

    q = _linear(p["q"], x).reshape(B, N, H, Dh).transpose(0, 2, 1, 3)
    k = _linear(p["k"], x).reshape(B, N, H, Dh).transpose(0, 2, 1, 3)
    v = _linear(p["v"], x).reshape(B, N, H, Dh).transpose(0, 2, 1, 3)

    weights = None
    if attn_fn is not None:
        # caller-supplied attention (e.g. sequence-parallel ring attention)
        out = attn_fn(q, k, v, pad_mask)
    elif (attn_impl == "pallas" and not return_weights
          and not deterministic and N % 128 == 0):
        # training path: fused attention with in-kernel dropout and a custom
        # VJP (the inference kernel is not differentiable); rate=0 is exact
        from vidsum_tpu.ops.attention_train import flash_attention_dropout
        if rng is not None and cfg.dropout > 0.0:
            seed = jax.random.randint(rng, (1, 1), 0, 2**31 - 1, jnp.int32)
        else:
            seed = jnp.zeros((1, 1), jnp.int32)
        mask8 = (pad_mask.astype(jnp.int8)[:, None, :] if pad_mask is not None
                 else jnp.zeros((B, 1, N), jnp.int8))
        out = flash_attention_dropout(q, k, v, mask8, seed, cfg.dropout,
                                      cfg.attn_scale)
    elif attn_impl == "pallas" and not return_weights and (
            deterministic or cfg.dropout == 0.0):
        from vidsum_tpu.ops.attention import flash_attention
        out = flash_attention(q, k, v, pad_mask, scale=cfg.attn_scale)
    else:
        scores = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                            preferred_element_type=jnp.float32) * cfg.attn_scale
        if pad_mask is not None:
            # key mask: (B, N) → (B, 1, 1, N); True = padded → -inf
            scores = jnp.where(pad_mask[:, None, None, :], -jnp.inf, scores)
        weights = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        if attn_keep is not None and not deterministic:
            dropped = _apply_keep(weights, attn_keep, cfg.dropout)
        else:
            dropped = _dropout(weights, cfg.dropout, rng, deterministic)
        out = jnp.einsum("bhnm,bhmd->bhnd", dropped, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(B, N, H * Dh)
    out = _linear(p["proj"], out)
    return out, (weights if return_weights else None)


def _mlp(p: Params, x: jnp.ndarray, cfg: ModelConfig, rng,
         deterministic: bool, mlp_keep=None) -> jnp.ndarray:
    """2-layer FFN, dropout after ReLU only (reference: simnet.py:167-183)."""
    h = jax.nn.relu(_linear(p["fc1"], x))
    if mlp_keep is not None and not deterministic:
        h = _apply_keep(h, mlp_keep, cfg.dropout)
    else:
        h = _dropout(h, cfg.dropout, rng, deterministic)
    return _linear(p["fc2"], h)


def simnet_apply(params: Params, cfg: ModelConfig, x: jnp.ndarray,
                 pad_mask: Optional[jnp.ndarray] = None, *,
                 rng=None, deterministic: bool = True,
                 model_score: bool = False, return_attn: bool = False,
                 attn_impl: str = "xla", attn_fn=None, pos_offset=None,
                 pe_len: Optional[int] = None, dropout_masks=None):
    """Run the scorer.

    :param x: (B, N, 1024) frame features.
    :param pad_mask: optional (B, N) bool, True at padded frames.
    :param rng: PRNG key, required when ``deterministic=False``.
    :param attn_impl: 'xla' (dense, fused by XLA) or 'pallas' (fused
        flash-attention kernel; inference/no-attn-dropout path).
    :param attn_fn: optional override ``(q, k, v, pad_mask) -> out`` for the
        attention op (used by the sequence-parallel ring forward).
    :param pos_offset: optional scalar global position of ``x[:, 0]`` for the
        positional encoding (nonzero when the sequence axis is sharded).
    :param pe_len: PE-table length override — REQUIRED to be the *global*
        sequence length when ``pos_offset`` is used, else positions past
        ``max(max_len, N_local)`` would slice a too-short table (clamped =
        silently wrong encodings; caught by the >2,500-frame sharded
        pipeline test).
    :param dropout_masks: optional per-layer list of boolean *keep*-mask
        dicts ``{"attn": (B,H,N,N), "res1": (B,N,d), "mlp": (B,N,4d),
        "res2": (B,N,d)}`` replacing the internal RNG draws — used by the
        cross-framework lockstep tests to inject bit-identical masks here
        and into a torch mirror. Dense XLA path only.
    :returns: ``(scores, hidden)`` — (B, N(+1 if cls), num_classes) logits and
        the final hidden states; with ``return_attn`` also a list of per-layer
        attention maps. ``model_score`` mirrors the reference's flag (its dead
        score branch makes both returns identical, simnet.py:66-83).
    """
    del model_score  # reference quirk: both branches return the same tensors
    if not deterministic and rng is None and dropout_masks is None:
        raise ValueError("rng is required when deterministic=False")

    compute_dtype = jnp.dtype(cfg.compute_dtype)
    x = x.astype(compute_dtype)
    B, N, _ = x.shape

    use_int8 = attn_impl in ("int8_block", "int8_xla")
    if use_int8:
        # opt-in W8A8 quantized scoring (ops/quant.py): inference-only and
        # LOSSY by design — rounding has no useful gradient, and attention
        # maps are pinned to the production export path
        if not deterministic:
            raise ValueError("int8 scoring path is inference-only; use the "
                             "bf16 kernels for training")
        if return_attn:
            raise ValueError("int8 scoring path does not return attention "
                             "maps; use attn_impl='xla' for export")
        if cfg.norm_first:
            raise ValueError("int8 scoring path implements the reference's "
                             "post-LN block only")
        if attn_fn is not None:
            raise ValueError("int8 scoring path does not compose with a "
                             "caller-supplied attention (ring); use the "
                             "bf16 ladder for sequence-parallel scoring")
        # shape-aware demotion, decided BEFORE the embed so a demoted
        # forward is fully lossless. Benign direction only: odd lengths
        # (e.g. the +1 CLS token) fall to the dense int8 path; shapes past
        # the kernel's VMEM envelope leave the quantized path entirely for
        # the bf16 flash ladder (long videos exit quantization).
        n_eff = N + (1 if cfg.use_cls else 0)
        if attn_impl == "int8_block":
            from vidsum_tpu.ops.block_kernel_int8 import (
                fused_block_int8_supported)
            if n_eff % 128 != 0:
                attn_impl = "int8_xla"
            elif not fused_block_int8_supported(B, n_eff, cfg.d_model,
                                                compute_dtype.itemsize):
                attn_impl = "pallas"
                use_int8 = False

    # Embedding: Linear 1024→d + PE (reference: simnet.py:186-217)
    if use_int8:
        from vidsum_tpu.ops.quant import int8_linear, quantize_weight
        ew, es = quantize_weight(params["embed"]["w"])
        h = int8_linear(x, ew, es, params["embed"]["b"]).astype(compute_dtype)
    else:
        h = _linear(params["embed"], x)
    if cfg.use_pos:
        pe = positional_encoding_table(max(cfg.max_len, pe_len or 0, N),
                                       cfg.d_model)
        if pos_offset is not None:
            pe = jax.lax.dynamic_slice_in_dim(
                jnp.asarray(pe), pos_offset, N, axis=0)
        else:
            pe = pe[:N]
        h = h + pe[None].astype(compute_dtype)
        if not deterministic and cfg.pos_dropout > 0.0:
            rng, sub = jax.random.split(rng)
            h = _dropout(h, cfg.pos_dropout, sub, deterministic)
    if cfg.use_cls:
        cls = jnp.broadcast_to(params["cls"].astype(compute_dtype),
                               (B, 1, cfg.d_model))
        h = jnp.concatenate([cls, h], axis=1)
        if pad_mask is not None:
            pad_mask = jnp.concatenate(
                [jnp.zeros((B, 1), dtype=bool), pad_mask], axis=1)

    if use_int8:
        from vidsum_tpu.ops.quant import (int8_encoder_block_xla,
                                          quantize_block)
        if attn_impl == "int8_block":
            from vidsum_tpu.ops.block_kernel_int8 import (
                fused_encoder_block_int8)
        for block in params["blocks"]:
            qb = quantize_block(block)
            if attn_impl == "int8_block":
                h = fused_encoder_block_int8(qb, h, pad_mask, cfg.num_heads,
                                             cfg.attn_scale)
            else:
                h = int8_encoder_block_xla(qb, h, pad_mask, cfg.num_heads,
                                           cfg.attn_scale)
        scores = _linear(params["head"], h).astype(jnp.float32)
        return scores, h

    if attn_impl == "pallas_block" and (deterministic
                                        or dropout_masks is None):
        # shape-aware demotion: past the block kernels' VMEM envelope
        # (long-video dense path, N ≳ 5-8k at d=256) fall to the flash
        # attention kernels + XLA block instead of failing — 4.1× faster
        # than the XLA dense fallback at N=10240 (PERF.md long-context
        # envelope)
        from vidsum_tpu.ops.block_kernel import fused_block_supported
        from vidsum_tpu.ops.block_train import fused_block_train_supported
        ok = (fused_block_supported(B, h.shape[1], cfg.d_model,
                                    h.dtype.itemsize)
              if deterministic else
              fused_block_train_supported(B, h.shape[1], cfg.d_model,
                                          cfg.num_heads))
        if not ok:
            attn_impl = "pallas"
    use_fused_block = (attn_impl == "pallas_block" and not return_attn
                       and not cfg.norm_first and deterministic)
    use_fused_block_train = (attn_impl == "pallas_block" and not return_attn
                             and not cfg.norm_first and not deterministic
                             and dropout_masks is None
                             and h.shape[1] % 128 == 0)
    attn_maps: List[jnp.ndarray] = []
    for layer_idx, block in enumerate(params["blocks"]):
        if use_fused_block:
            from vidsum_tpu.ops.block_kernel import fused_encoder_block
            h = fused_encoder_block(block, h, pad_mask, cfg.num_heads,
                                    cfg.attn_scale)
            continue
        if use_fused_block_train:
            # whole-block training kernel: fwd+bwd fused, all dropout sites
            # in-kernel (custom VJP, ops/block_train.py)
            from vidsum_tpu.ops.block_train import fused_block_train
            if rng is not None and cfg.dropout > 0.0:
                rng, sub = jax.random.split(rng)
                seed = jax.random.randint(sub, (1, 1), 0, 2**31 - 1,
                                          jnp.int32)
            else:
                seed = jnp.full((1, 1), layer_idx, jnp.int32)
            Bh, Nh = h.shape[0], h.shape[1]
            mask8 = (pad_mask.astype(jnp.int8)[:, None, :]
                     if pad_mask is not None
                     else jnp.zeros((Bh, 1, Nh), jnp.int8))
            h = fused_block_train(h, block, mask8, seed, cfg.num_heads,
                                  cfg.attn_scale, cfg.dropout)
            continue
        if rng is not None:
            rng, r_attn, r_d1, r_mlp, r_d2 = jax.random.split(rng, 5)
        else:
            r_attn = r_d1 = r_mlp = r_d2 = None
        lm = dropout_masks[layer_idx] if dropout_masks is not None else None

        def _res_drop(t, key, r):
            if lm is not None and not deterministic:
                return _apply_keep(t, lm[key], cfg.dropout)
            return _dropout(t, cfg.dropout, r, deterministic)

        attn_keep = lm["attn"] if lm is not None else None
        mlp_keep = lm["mlp"] if lm is not None else None
        if cfg.norm_first:
            sa, w = _attention(block["attn"], _layernorm(block["ln1"], h),
                               pad_mask, cfg, r_attn, deterministic,
                               return_attn, attn_impl, attn_fn, attn_keep)
            h = h + _res_drop(sa, "res1", r_d1)
            ff = _mlp(block["mlp"], _layernorm(block["ln2"], h), cfg, r_mlp,
                      deterministic, mlp_keep)
            h = h + _res_drop(ff, "res2", r_d2)
        else:
            sa, w = _attention(block["attn"], h, pad_mask, cfg, r_attn,
                               deterministic, return_attn, attn_impl,
                               attn_fn, attn_keep)
            h = _layernorm(block["ln1"], _res_drop(sa, "res1", r_d1) + h)
            ff = _mlp(block["mlp"], h, cfg, r_mlp, deterministic, mlp_keep)
            h = _layernorm(block["ln2"], _res_drop(ff, "res2", r_d2) + h)
        if return_attn:
            attn_maps.append(w)

    scores = _linear(params["head"], h).astype(jnp.float32)
    if return_attn:
        return scores, h, attn_maps
    return scores, h


def count_params(params: Params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
