"""Fused int8 encoder-block Pallas kernel — the W8A8 scoring fast path.

Same one-HBM-pass structure as the bf16 fused block
(``ops/block_kernel.py``: x read once, output written once, everything
else resident in VMEM), with every linear matmul and the Q·K^T product
running on the int8 MXU (measured 1.91x the bf16 rate on this chip,
``scripts/probe_int8_mxu.py``). Quantization is dynamic per-row
(``ops/quant.py`` scheme): x is quantized once per cell and feeds all of
Q/K/V; Q/K rows are re-quantized per head for the score product; P·V
stays bf16 (probability tiles quantize poorly for only ~12% of FLOPs).
The integer arithmetic is bit-identical to the dense reference
``ops.quant.int8_encoder_block_xla`` — int8 dots are exact, the same
reciprocal-multiply quantizer runs in both — so CPU interpret tests pin
kernel == reference to f32 glue round-off.

Inference-only and LOSSY by design (opt-in ``attn_impl='int8_block'``);
accuracy cost vs the f32 scorer is measured end-task in
scripts/study_int8_compute_accuracy.py. Reference: no counterpart —
TPU-native surface over ``src/model/simnet.py``'s block semantics.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vidsum_tpu.ops.block_kernel import _pick_group, _pick_tile
from vidsum_tpu.ops.quant import quantize_block  # re-export convenience

__all__ = ["fused_encoder_block_int8", "fused_block_int8_supported",
           "quantize_block"]

LN_EPS = 1e-5


def _layernorm_f32(x, scale, bias):
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + LN_EPS) * scale + bias


def _quant_rows(xf):
    """In-kernel dynamic per-row int8 — identical arithmetic to
    ``ops.quant.quantize_rows`` (reciprocal-multiply, zero-row guard)."""
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.where(absmax > 0.0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(xf * (1.0 / scale)), -127.0, 127.0
                 ).astype(jnp.int8)
    return q, scale


def _i8dot(a8, b8, dims):
    return jax.lax.dot_general(a8, b8, (dims, ((), ())),
                               preferred_element_type=jnp.int32
                               ).astype(jnp.float32)


def _block_kernel_int8(x_ref, mask_ref,
                       wq_ref, sq_ref, bq_ref, wk_ref, sk_ref, bk_ref,
                       wv_ref, sv_ref, bv_ref, wp_ref, sp_ref, bp_ref,
                       ln1s_ref, ln1b_ref,
                       wf1_ref, sf1_ref, bf1_ref, wf2_ref, sf2_ref, bf2_ref,
                       ln2s_ref, ln2b_ref, o_ref, *,
                       num_heads: int, scale: float, n_q_tiles: int,
                       tile_q: int, qk_int8: bool):
    x = x_ref[0]                              # (N, d) bf16/f32
    key_mask = mask_ref[0] != 0               # (1, N)
    N, d = x.shape
    Dh = d // num_heads

    # one row quantization of x feeds Q, K and V
    x8, sx = _quant_rows(x.astype(jnp.float32))

    k = _i8dot(x8, wk_ref[...], ((1,), (0,))) * (sx * sk_ref[...]) + bk_ref[...]
    v = _i8dot(x8, wv_ref[...], ((1,), (0,))) * (sx * sv_ref[...]) + bv_ref[...]
    v = v.astype(x.dtype)                     # P·V stays bf16

    # per-head int8 K for the score product
    k8s, ksc = [], []
    if qk_int8:
        for h in range(num_heads):
            k8_h, ks_h = _quant_rows(k[:, h * Dh:(h + 1) * Dh])
            k8s.append(k8_h)
            ksc.append(ks_h)
    else:
        kc = k.astype(x.dtype)

    def tile(i, _):
        # re-quantize the tile's rows straight from the ref (Mosaic can't
        # dynamic-slice computed VALUES like x8, only refs) — per-row
        # quantization is row-local, so the codes are identical to x8's
        xq_t = x_ref[0, pl.ds(i * tile_q, tile_q), :]
        x8_t, sx_t = _quant_rows(xq_t.astype(jnp.float32))
        q = (_i8dot(x8_t, wq_ref[...], ((1,), (0,)))
             * (sx_t * sq_ref[...]) + bq_ref[...])               # (T, d) f32

        outs = []
        for h in range(num_heads):
            sl = slice(h * Dh, (h + 1) * Dh)
            if qk_int8:
                q8_h, qs_h = _quant_rows(q[:, sl])
                s = (_i8dot(q8_h, k8s[h], ((1,), (1,)))
                     * (qs_h * ksc[h].T)) * scale                # (T, N)
            else:
                s = jax.lax.dot_general(
                    q[:, sl].astype(x.dtype), kc[:, sl],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
            s = jnp.where(key_mask, -jnp.inf, s)
            m = jnp.max(s, axis=1, keepdims=True)
            e = jnp.exp(s - m)
            p = e * (1.0 / jnp.sum(e, axis=1, keepdims=True))
            outs.append(jax.lax.dot_general(
                p.astype(x.dtype), v[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))             # (T, Dh)
        attn = jnp.concatenate(outs, axis=1)                     # (T, d) f32

        a8, sa = _quant_rows(attn)
        proj = _i8dot(a8, wp_ref[...], ((1,), (0,))) * (sa * sp_ref[...]) \
            + bp_ref[...]
        h1 = _layernorm_f32(proj + xq_t.astype(jnp.float32),
                            ln1s_ref[...], ln1b_ref[...])        # (T, d)

        h8, sh = _quant_rows(h1)
        m1 = jnp.maximum(
            _i8dot(h8, wf1_ref[...], ((1,), (0,))) * (sh * sf1_ref[...])
            + bf1_ref[...], 0.0)
        m8, sm = _quant_rows(m1)
        m2 = _i8dot(m8, wf2_ref[...], ((1,), (0,))) * (sm * sf2_ref[...]) \
            + bf2_ref[...]
        out = _layernorm_f32(m2 + h1, ln2s_ref[...], ln2b_ref[...])
        o_ref[0, pl.ds(i * tile_q, tile_q), :] = out.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_q_tiles, tile, 0)


def _block_kernel_int8_grouped(x_ref, mask_ref,
                               wq_ref, sq_ref, bq_ref, wk_ref, sk_ref,
                               bk_ref, wv_ref, sv_ref, bv_ref,
                               wp_ref, sp_ref, bp_ref, ln1s_ref, ln1b_ref,
                               wf1_ref, sf1_ref, bf1_ref,
                               wf2_ref, sf2_ref, bf2_ref,
                               ln2s_ref, ln2b_ref, o_ref, *,
                               num_heads: int, scale: float, group: int,
                               qk_int8: bool):
    """Grouped variant for short sequences (see
    ``block_kernel._block_kernel_grouped``): row-wise matmuls batch over
    the G·N rows, attention runs per element."""
    G = group
    N, d = x_ref.shape[1], x_ref.shape[2]
    Dh = d // num_heads
    xf = x_ref[...].reshape(G * N, d)                 # (GN, d)

    x8, sx = _quant_rows(xf.astype(jnp.float32))
    q = _i8dot(x8, wq_ref[...], ((1,), (0,))) * (sx * sq_ref[...]) + bq_ref[...]
    k = _i8dot(x8, wk_ref[...], ((1,), (0,))) * (sx * sk_ref[...]) + bk_ref[...]
    v = _i8dot(x8, wv_ref[...], ((1,), (0,))) * (sx * sv_ref[...]) + bv_ref[...]
    v = v.astype(xf.dtype)

    groups = []
    for g in range(G):
        key_mask = mask_ref[g] != 0                   # (1, N)
        rows = slice(g * N, (g + 1) * N)
        outs = []
        for h in range(num_heads):
            sl = slice(h * Dh, (h + 1) * Dh)
            if qk_int8:
                q8_h, qs_h = _quant_rows(q[rows, sl])
                k8_h, ks_h = _quant_rows(k[rows, sl])
                s = (_i8dot(q8_h, k8_h, ((1,), (1,)))
                     * (qs_h * ks_h.T)) * scale       # (N, N)
            else:
                s = jax.lax.dot_general(
                    q[rows, sl].astype(xf.dtype), k[rows, sl].astype(xf.dtype),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * scale
            s = jnp.where(key_mask, -jnp.inf, s)
            m = jnp.max(s, axis=1, keepdims=True)
            e = jnp.exp(s - m)
            p = e * (1.0 / jnp.sum(e, axis=1, keepdims=True))
            outs.append(jax.lax.dot_general(
                p.astype(xf.dtype), v[rows, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))  # (N, Dh)
        groups.append(jnp.concatenate(outs, axis=1))  # (N, d)
    attn = jnp.concatenate(groups, axis=0)            # (GN, d) f32

    a8, sa = _quant_rows(attn)
    proj = _i8dot(a8, wp_ref[...], ((1,), (0,))) * (sa * sp_ref[...]) \
        + bp_ref[...]
    h1 = _layernorm_f32(proj + xf.astype(jnp.float32),
                        ln1s_ref[...], ln1b_ref[...])
    h8, sh = _quant_rows(h1)
    m1 = jnp.maximum(
        _i8dot(h8, wf1_ref[...], ((1,), (0,))) * (sh * sf1_ref[...])
        + bf1_ref[...], 0.0)
    m8, sm = _quant_rows(m1)
    m2 = _i8dot(m8, wf2_ref[...], ((1,), (0,))) * (sm * sf2_ref[...]) \
        + bf2_ref[...]
    out = _layernorm_f32(m2 + h1, ln2s_ref[...], ln2b_ref[...])
    o_ref[...] = out.reshape(G, N, d).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "scale", "interpret",
                                    "tile_q", "qk_int8"))
def _fused_block_int8(x, pad_mask, flat_w, num_heads: int, scale: float,
                      interpret: bool, tile_q: int, qk_int8: bool):
    B, N, d = x.shape
    n_q_tiles = N // tile_q

    full = lambda b: (0, 0)
    full1 = lambda b: (0,)
    w_specs = []
    for w in flat_w:
        if w.ndim == 2:
            w_specs.append(pl.BlockSpec(w.shape, full,
                                        memory_space=pltpu.VMEM))
        else:
            w_specs.append(pl.BlockSpec(w.shape, full1,
                                        memory_space=pltpu.VMEM))

    group = _pick_group(B, N)
    if group > 1:
        kernel = functools.partial(_block_kernel_int8_grouped,
                                   num_heads=num_heads, scale=scale,
                                   group=group, qk_int8=qk_int8)
        io_spec = pl.BlockSpec((group, N, d), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)
        mask_spec = pl.BlockSpec((group, 1, N), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
        grid = (B // group,)
    else:
        kernel = functools.partial(_block_kernel_int8, num_heads=num_heads,
                                   scale=scale, n_q_tiles=n_q_tiles,
                                   tile_q=tile_q, qk_int8=qk_int8)
        io_spec = pl.BlockSpec((1, N, d), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)
        mask_spec = pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
        grid = (B,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[io_spec, mask_spec, *w_specs],
        out_specs=io_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=B * N * (8 * d * d + 4 * N * d + 16 * d * d),
            bytes_accessed=2 * B * N * d * x.dtype.itemsize,
            transcendentals=B * N * N,
        ),
        interpret=interpret,
    )(x, pad_mask, *flat_w)


_VMEM_BUDGET = 12 * 1024 * 1024


def _working_set_bytes(B: int, N: int, d: int, itm: int, tile_q: int) -> int:
    """Per-cell VMEM model. vs the bf16 kernel: weights drop to 9d² int8
    (+36d f32 scale/bias rows), but x8 (N,d int8) + the f32 K/V epilogue
    (transiently 2·4·N·d) join x/V residents. The grouped path keeps the
    (GN, 4d) f32 MLP activation like its bf16 twin."""
    grp = _pick_group(B, N)
    if grp > 1:
        rows = grp * N
        return (rows * d * (itm + 1)            # x resident + x8
                + 3 * 4 * rows * d              # q/k f32 + v epilogue
                + 2 * rows * d                  # v bf16
                + 9 * d * d                     # int8 weights
                + 4 * rows * 4 * d + 4 * N * N)  # m1 f32 + score tile
    return (N * d * (itm + 1 + 1)               # x + x8 + k8
            + 4 * N * d + 2 * N * d             # k f32 transient + v bf16
            + 9 * d * d
            + 4 * tile_q * N + 4 * tile_q * 4 * d)


def fused_block_int8_supported(B: int, N: int, d: int,
                               itemsize: int = 2) -> bool:
    """True when the int8 fused kernel's VMEM guard admits this shape
    (callers demote to the lossless bf16 ladder past it — falling back to
    MORE accurate is the benign direction for an opt-in lossy path)."""
    if N % 128 != 0:
        return False
    return _working_set_bytes(B, N, d, itemsize,
                              _pick_tile(N)) <= _VMEM_BUDGET


def fused_encoder_block_int8(qblock: Dict[str, Any], x: jnp.ndarray,
                             pad_mask, num_heads: int, scale: float,
                             tile_q: int = 0,
                             qk_int8: bool | None = None) -> jnp.ndarray:
    """Run one quantized post-LN encoder block fused on-chip.

    ``qblock`` is a :func:`vidsum_tpu.ops.quant.quantize_block` tree;
    x (B, N, d) float; pad_mask (B, N) bool or None; N a multiple of 128.
    ``qk_int8=True`` also runs the Q·K^T product int8 — measured SLOWER
    on chip at every probed shape (d=256: 0.73x vs 0.95x; d=512: 1.26x vs
    1.31x — per-head Dh=64 int8 contractions + per-head re-quantization
    don't pack; PERF.md "int8 scoring"), so the default keeps QK bf16.
    Env override ``VIDSUM_TPU_INT8_QK=1``, read at trace time.
    """
    if qk_int8 is None:
        import os
        qk_int8 = os.environ.get("VIDSUM_TPU_INT8_QK", "0") == "1"
    B, N, d = x.shape
    if not tile_q:
        tile_q = _pick_tile(N)
    if N % tile_q != 0:
        raise ValueError(f"N={N} must be a multiple of {tile_q}")
    vmem = _working_set_bytes(B, N, d, x.dtype.itemsize, tile_q)
    if vmem > _VMEM_BUDGET:
        raise ValueError(
            f"int8 fused block working set ~{vmem >> 20} MB exceeds VMEM "
            f"at N={N}, d={d}; use the bf16 ladder for this shape")
    if pad_mask is None:
        pad_mask = jnp.zeros((B, N), bool)
    mask = pad_mask.astype(jnp.int8)[:, None, :]

    a, m = qblock["attn"], qblock["mlp"]
    flat_w = tuple(
        t for lin in (a["q"], a["k"], a["v"], a["proj"])
        for t in (lin["wq"], lin["sw"], lin["b"])
    ) + (qblock["ln1"]["scale"], qblock["ln1"]["bias"]) + tuple(
        t for lin in (m["fc1"], m["fc2"])
        for t in (lin["wq"], lin["sw"], lin["b"])
    ) + (qblock["ln2"]["scale"], qblock["ln2"]["bias"])
    interpret = jax.default_backend() != "tpu"
    return _fused_block_int8(x, mask, flat_w, num_heads, scale, interpret,
                             tile_q, qk_int8)
