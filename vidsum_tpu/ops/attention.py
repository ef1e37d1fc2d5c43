"""Fused masked-attention Pallas TPU kernel.

This is the framework's hot op: the reference's per-layer attention
(``src/model/simnet.py:148-163`` — QK^T·scale → key-mask fill → softmax → AV)
materializes the (B, H, N, N) score tensor in HBM four times per model and
forces a device→host copy of the weights every forward (simnet.py:164). Here
the whole block runs on-chip: for each (batch, head) grid cell the kernel
streams query tiles through VMEM, computes scores against all keys on the MXU,
applies the key padding mask and a numerically-stable softmax on the VPU, and
multiplies into the output tile — the N×N matrix never touches HBM.

Video-summarization shapes (N ≤ 2560, head_dim 64) let each (b, h) cell hold
full K/V in VMEM (≤ 2560·64·4B ≈ 0.7 MB), so no online-softmax rescaling pass
is needed — one tile of scores (TILE_Q × N ≈ 1.3 MB fp32) is exact. Past the
single-pass budget (N ≳ 16k) a key-block-folded variant keeps only K/V
resident and folds (TILE_Q, kb) score blocks into an online-softmax carry,
carrying arbitrary-length videos (PERF.md "long-context envelope").

Inputs may be bf16 (the TPU AMP analogue); matmuls accumulate in fp32 via
``preferred_element_type`` and the softmax runs in fp32.

Falls back to interpret mode off-TPU so the same code path is testable on the
CPU harness.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_Q = 128
NEG_INF = float("-inf")


def _attention_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float,
                      n_q_tiles: int):
    """One (batch, head) cell: all query tiles vs all keys.

    Ref shapes (leading singleton grid dims squeezed by indexing):
      q_ref/k_ref/v_ref: (1, 1, N, Dh), mask_ref: (1, 1, N) int8 (nonzero =
      padded; 3-D so the block satisfies Mosaic's equal-to-array-dim rule),
      o_ref like q.
    """
    k = k_ref[0, 0]                      # (N, Dh)
    v = v_ref[0, 0]                      # (N, Dh)
    # keep the mask 2-D — Mosaic's layout inference rejects 1-D vectors
    key_mask = mask_ref[0] != 0          # (1, N), True = padded

    def tile(i, _):
        q = q_ref[0, 0, pl.ds(i * TILE_Q, TILE_Q), :]          # (Tq, Dh)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale        # (Tq, N)
        s = jnp.where(key_mask, NEG_INF, s)  # (1, N) broadcasts over rows
        # stable softmax in fp32 on the VPU
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (Tq, Dh)
        o_ref[0, 0, pl.ds(i * TILE_Q, TILE_Q), :] = o.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_q_tiles, tile, 0)


_DEAD = -1e37  # rows below this max have seen no unmasked key yet


def _attention_kernel_folded(q_ref, k_ref, v_ref, mask_ref, o_ref, *,
                             scale: float, n_q_tiles: int, kb: int,
                             n_kb: int):
    """Key-block-folded variant for long sequences: K/V stay resident
    (O(N·Dh), a few MB even at 100k keys) but scores are computed per
    (TILE_Q, kb) block and folded into an online-softmax carry — the
    (TILE_Q, N) f32 score tile that capped the single-pass kernel never
    exists. Same fold arithmetic as the ring-step kernel
    (parallel/ring_attention._ring_block_kernel); with n_kb == 1 this
    reduces to the stable single-pass softmax."""
    def tile(i, _):
        q = q_ref[0, 0, pl.ds(i * TILE_Q, TILE_Q), :]          # (Tq, Dh)

        def fold(j, carry):
            o, m, l = carry
            kblk = k_ref[0, 0, pl.ds(j * kb, kb), :]           # (kb, Dh)
            vblk = v_ref[0, 0, pl.ds(j * kb, kb), :]
            mblk = mask_ref[0, :, pl.ds(j * kb, kb)] != 0      # (1, kb)
            s = jax.lax.dot_general(
                q, kblk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale    # (Tq, kb)
            s = jnp.where(mblk, NEG_INF, s)
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            dead = m_new < _DEAD
            m_safe = jnp.where(dead, 0.0, m_new)
            e = jnp.where(dead, 0.0, jnp.exp(s - m_safe))
            corr = jnp.where(m < _DEAD, 0.0, jnp.exp(m - m_safe))
            l = l * corr + jnp.sum(e, axis=1, keepdims=True)
            o = o * corr + jax.lax.dot_general(
                e.astype(vblk.dtype), vblk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return o, m_new, l

        o, m, l = jax.lax.fori_loop(
            0, n_kb, fold,
            (jnp.zeros((TILE_Q, q_ref.shape[-1]), jnp.float32),
             jnp.full((TILE_Q, 1), NEG_INF, jnp.float32),
             jnp.zeros((TILE_Q, 1), jnp.float32)))
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o = jnp.where(l == 0.0, 0.0, o * (1.0 / l_safe))
        o_ref[0, 0, pl.ds(i * TILE_Q, TILE_Q), :] = o.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_q_tiles, tile, 0)


def _pick_key_block(N: int) -> int:
    """Largest 128-multiple divisor of N capped at 4096 (the score-tile
    budget: TILE_Q × kb f32 ≈ 2 MB at the cap)."""
    for kb in (4096, 2048, 1024, 512, 256, 128):
        if N % kb == 0:
            return kb
    return TILE_Q


@functools.partial(jax.jit, static_argnames=("scale", "interpret", "kb"))
def _flash_attention_folded(q, k, v, pad_mask, scale: float, interpret: bool,
                            kb: int):
    B, H, N, Dh = q.shape
    grid = (B, H)
    qkv_spec = pl.BlockSpec((1, 1, N, Dh), lambda b, h: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, 1, N), lambda b, h: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    pad_mask = pad_mask.astype(jnp.int8)[:, None, :]
    kernel = functools.partial(_attention_kernel_folded, scale=scale,
                               n_q_tiles=N // TILE_Q, kb=kb, n_kb=N // kb)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec, mask_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * N * N * Dh,
            bytes_accessed=4 * B * H * N * Dh * q.dtype.itemsize,
            transcendentals=B * H * N * N,
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(q, k, v, pad_mask)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def _flash_attention(q, k, v, pad_mask, scale: float, interpret: bool):
    B, H, N, Dh = q.shape
    n_q_tiles = N // TILE_Q

    grid = (B, H)
    qkv_spec = pl.BlockSpec((1, 1, N, Dh), lambda b, h: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, 1, N), lambda b, h: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    pad_mask = pad_mask.astype(jnp.int8)[:, None, :]

    kernel = functools.partial(_attention_kernel, scale=scale,
                               n_q_tiles=n_q_tiles)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec, mask_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * N * N * Dh,
            bytes_accessed=4 * B * H * N * Dh * q.dtype.itemsize,
            transcendentals=B * H * N * N,
        ),
        # long-context: K/V (N, Dh) + the (TILE_Q, N) f32 score tile out-
        # grow Mosaic's conservative 16 MB default scoped-VMEM cap past
        # N≈16k; v5e has 128 MB VMEM per core
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(q, k, v, pad_mask)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    pad_mask: Optional[jnp.ndarray], scale: float
                    ) -> jnp.ndarray:
    """Fused attention. q/k/v: (B, H, N, Dh); pad_mask: (B, N) bool, True at
    padded keys (or None); returns (B, H, N, Dh) in q's dtype.

    Requires N to be a multiple of 128 (the collate layer's length buckets
    guarantee this); other shapes fall back to the XLA dense path.
    """
    B, H, N, Dh = q.shape
    if N % TILE_Q != 0:
        return _xla_attention(q, k, v, pad_mask, scale)
    if pad_mask is None:
        pad_mask = jnp.zeros((B, N), bool)
    interpret = jax.default_backend() != "tpu"
    # single-pass kernel while q/k/v/o (N, Dh) + one (TILE_Q, N) fp32 score
    # tile fit comfortably; past that, the key-block-folded kernel keeps
    # only K/V resident (previously this case silently fell back to XLA
    # dense — 107 ms vs the kernel at N=20480, and HBM-OOM at 40960)
    vmem_single = 4 * N * Dh * q.dtype.itemsize + 4 * TILE_Q * N
    if vmem_single <= 12 * 1024 * 1024:
        return _flash_attention(q, k, v, pad_mask, scale, interpret)
    kb = _pick_key_block(N)
    if flash_forward_supported(N, Dh, q.dtype.itemsize):
        return _flash_attention_folded(q, k, v, pad_mask, scale, interpret,
                                       kb)
    vmem_folded = _folded_forward_vmem(N, Dh, q.dtype.itemsize, kb)
    # Past the folded envelope (N ≳ 130k at Dh=64) a dense fallback would
    # need the (B, H, N, N) score tensor in HBM and OOM opaquely — fail
    # loudly with the same guidance as the train path (ADVICE r2).
    raise ValueError(
        f"flash_attention: N={N}, Dh={Dh} exceeds the key-folded kernel's "
        f"VMEM envelope ({vmem_folded / 2**20:.0f} MB > 80 MB) and the "
        f"dense fallback cannot fit in HBM at this length. Use sequence "
        f"parallelism (vidsum_tpu.parallel.seq_forward) or a shorter "
        f"length bucket.")


def _folded_forward_vmem(N: int, Dh: int, itemsize: int, kb: int) -> int:
    # q/k/v/o (N, Dh) windows + the folded kernel's (TILE_Q, kb) f32 score/
    # prob tiles + the two (TILE_Q, Dh) f32 carry accumulators
    return (4 * N * Dh * itemsize + 6 * TILE_Q * kb * 4
            + 2 * TILE_Q * Dh * 4)


def flash_forward_supported(N: int, Dh: int, itemsize: int = 4) -> bool:
    """True when the single-chip inference ladder's LAST rung (the key-
    folded flash kernel) can carry a length-``N`` forward inside its 80 MB
    scoped-VMEM envelope — the exact dispatch arithmetic
    :func:`flash_attention` uses. ``N`` is assumed bucketed (multiple of
    128, the collate contract); ``itemsize`` is the compute dtype's (2 for
    bfloat16). Serving uses this to decide when a request must leave the
    single-chip path for the sequence-parallel ring (``serve.py``)."""
    return _folded_forward_vmem(N, Dh, itemsize,
                                _pick_key_block(N)) <= 80 * 1024 * 1024


def _xla_attention(q, k, v, pad_mask, scale):
    """Dense reference path (what the 'xla' attn_impl computes in simnet)."""
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                   preferred_element_type=jnp.float32) * scale
    if pad_mask is not None:
        s = jnp.where(pad_mask[:, None, None, :], NEG_INF, s)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)
