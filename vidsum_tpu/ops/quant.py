"""Opt-in W8A8 int8 scoring path — dynamic activation quantization.

The v5e MXU runs int8 matmuls at ~2x its bf16 rate (measured on this
chip: 392 int8 TOPS vs 205 bf16 TFLOPS through XLA ``dot_general``,
``scripts/probe_int8_mxu.py``), and at the flagship scoring shape the
fused bf16 block kernel is MXU/pipeline-bound (PERF.md "Train-step
anatomy"), so quantizing the matmuls attacks the binding resource
directly. This module holds the quantization scheme and the dense XLA
realization of the quantized encoder block; the fused Pallas kernel that
actually reaches the int8 MXU rate lives in
``vidsum_tpu.ops.block_kernel_int8`` and implements bit-for-bit the same
integer arithmetic (the int8 dots are exact; only f32 glue can differ).

Scheme (standard W8A8, symmetric, zero-point-free):

- **Weights**: per-output-channel symmetric int8 — ``s_j =
  max_i |w_ij| / 127``; quantized once per program (in-graph from the f32
  params, so the param pytree and every caller's plumbing stay unchanged;
  XLA hoists it out of scan bodies and it is ~0.002% of forward FLOPs).
- **Activations**: dynamic per-row (per-token) symmetric int8 at each
  matmul input — ``s_t = max_d |x_td| / 127`` — computed in f32, with a
  guard scale of 1.0 for all-zero rows.
- **Matmul**: int8 x int8 -> int32 (exact), dequantized by the rank-1
  scale outer product, bias added in f32.
- **Attention**: Q·K^T runs int8 (per-row quant of Q and K per head);
  softmax stays f32; the P·V product stays bf16 (P is a freshly-computed
  probability tile — quantizing it costs accuracy for only ~12% of the
  FLOPs, so the first version keeps it lossless).
- LayerNorm, residuals, softmax, sigmoid: f32, same as the bf16 path.

This path is LOSSY and opt-in (``attn_impl='int8_xla' | 'int8_block'``),
like the serving wire's ``wire_dtype='int8'``; the end-task cost is
measured the same way (scripts/study_int8_compute_accuracy.py — %
bit-identical summaries vs the f32 scorer). It is inference-only:
rounding has no useful gradient, and training keeps the bf16 fused path.

Reference: the scored model is ``src/model/simnet.py`` (see
models/simnet.py for the behavior contract); the reference has no
quantized path — this is TPU-native surface, gated by the measured MXU
probe.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

LN_EPS = 1e-5


def quantize_rows(x: jnp.ndarray, out_scale_dims: bool = True):
    """Dynamic symmetric per-row int8 quantization along the last axis.

    Returns ``(q int8, scale f32)`` with ``scale`` keeping the reduced
    axis (shape ``(..., 1)``) so ``q * scale`` dequantizes directly.
    All-zero rows get scale 1.0 (quantize to exact zeros).
    """
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.where(absmax > 0.0, absmax / 127.0, 1.0)
    # reciprocal-multiply (not divide): cheaper on the VPU, and the fused
    # kernel uses the identical expression so the int8 codes bit-match
    q = jnp.clip(jnp.round(xf * (1.0 / scale)), -127.0, 127.0
                 ).astype(jnp.int8)
    if not out_scale_dims:
        scale = scale[..., 0]
    return q, scale


def quantize_weight(w: jnp.ndarray):
    """Per-output-channel symmetric int8 for a ``(K, M)`` weight.

    Returns ``(wq int8 (K, M), scale f32 (M,))``.
    """
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=0)
    scale = jnp.where(absmax > 0.0, absmax / 127.0, 1.0)
    wq = jnp.clip(jnp.round(wf * (1.0 / scale)), -127.0, 127.0
                  ).astype(jnp.int8)
    return wq, scale


def int8_linear(x: jnp.ndarray, wq: jnp.ndarray, sw: jnp.ndarray,
                b: jnp.ndarray | None) -> jnp.ndarray:
    """``x @ dequant(wq) + b`` with the matmul on the int8 MXU.

    x (..., K) any float dtype; returns f32. The int32 accumulation is
    exact for K·127² < 2³¹ (K ≤ ~133k — far past any scorer dim).
    """
    xq, sx = quantize_rows(x)
    o = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    o = o * (sx * sw)
    return o if b is None else o + b.astype(jnp.float32)


def quantize_block(block: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize one SimNet encoder block's six matmul weights.

    Biases and LN params pass through in f32. Output tree shape:
    ``{attn: {q/k/v/proj: {wq, sw, b}}, mlp: {fc1/fc2: {...}}, ln1, ln2}``.
    """
    def qlin(p):
        wq, sw = quantize_weight(p["w"])
        return {"wq": wq, "sw": sw, "b": p["b"].astype(jnp.float32)}

    a, m = block["attn"], block["mlp"]
    return {
        "attn": {k: qlin(a[k]) for k in ("q", "k", "v", "proj")},
        "mlp": {k: qlin(m[k]) for k in ("fc1", "fc2")},
        "ln1": jax.tree_util.tree_map(
            lambda t: t.astype(jnp.float32), block["ln1"]),
        "ln2": jax.tree_util.tree_map(
            lambda t: t.astype(jnp.float32), block["ln2"]),
    }


def _layernorm_f32(x, scale, bias):
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + LN_EPS) * scale + bias


def int8_encoder_block_xla(qblock: Dict[str, Any], x: jnp.ndarray,
                           pad_mask, num_heads: int, scale: float,
                           qk_int8: bool | None = None) -> jnp.ndarray:
    """Dense XLA realization of the quantized post-LN encoder block.

    Numerics reference for the fused kernel (same quantization decisions,
    same reciprocal-multiply softmax normalization, bf16 P·V): the int8
    dots are exact integers, so the two implementations agree to f32
    round-off of the glue. ``qk_int8`` follows the kernel's default
    (env ``VIDSUM_TPU_INT8_QK``, off unless =1 — QK-int8 measured slower
    at every probed shape, PERF.md "int8 scoring") so the two paths stay
    the same arithmetic. x (B, N, d) float; returns x.dtype (B, N, d).
    """
    if qk_int8 is None:
        import os
        qk_int8 = os.environ.get("VIDSUM_TPU_INT8_QK", "0") == "1"
    B, N, d = x.shape
    Dh = d // num_heads
    a, m = qblock["attn"], qblock["mlp"]
    cdt = x.dtype

    # one row quantization of x feeds all three of Q/K/V
    xq, sx = quantize_rows(x)

    def lin(tq, st, p):
        o = jax.lax.dot_general(
            tq, p["wq"], (((tq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        return o * (st * p["sw"]) + p["b"]

    q = lin(xq, sx, a["q"]).reshape(B, N, num_heads, Dh).transpose(0, 2, 1, 3)
    k = lin(xq, sx, a["k"]).reshape(B, N, num_heads, Dh).transpose(0, 2, 1, 3)
    v = lin(xq, sx, a["v"]).reshape(B, N, num_heads, Dh).transpose(0, 2, 1, 3)

    if qk_int8:
        q8, sq = quantize_rows(q)
        k8, sk = quantize_rows(k)
        s = jnp.einsum("bhnd,bhmd->bhnm", q8, k8,
                       preferred_element_type=jnp.int32).astype(jnp.float32)
        s = s * (sq * jnp.swapaxes(sk, -1, -2)) * scale
    else:
        s = jnp.einsum("bhnd,bhmd->bhnm", q.astype(cdt), k.astype(cdt),
                       preferred_element_type=jnp.float32) * scale
    if pad_mask is not None:
        s = jnp.where(pad_mask[:, None, None, :], -jnp.inf, s)
    mx = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - mx)
    p = e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))
    attn = jnp.einsum("bhnm,bhmd->bhnd", p.astype(cdt), v.astype(cdt),
                      preferred_element_type=jnp.float32)
    attn = attn.transpose(0, 2, 1, 3).reshape(B, N, d)

    aq, sa = quantize_rows(attn)
    proj = lin(aq, sa, a["proj"])
    h1 = _layernorm_f32(proj + x.astype(jnp.float32),
                        qblock["ln1"]["scale"], qblock["ln1"]["bias"])

    hq, sh = quantize_rows(h1)
    m1 = jnp.maximum(lin(hq, sh, m["fc1"]), 0.0)
    mq, sm = quantize_rows(m1)
    m2 = lin(mq, sm, m["fc2"])
    out = _layernorm_f32(m2 + h1, qblock["ln2"]["scale"],
                         qblock["ln2"]["bias"])
    return out.astype(cdt)
