"""Trainable fused attention with in-kernel dropout (custom VJP).

The reference drops out the attention *weights* every training step
(``src/model/simnet.py:159``), which on the XLA path costs a full
(B, H, N, N) random mask materialized through HBM — measured as the largest
single slice of the train step (PERF.md). Here both passes are Pallas
kernels and the mask never exists as a tensor:

- **forward**: flash-style tiles: scores, stable softmax, dropout from a
  counter-based hash mask (murmur-style fmix over seed/batch/head/position;
  the hardware PRNG was rejected because its bit-to-element mapping is
  vector-layout-dependent and the fwd/bwd kernels observed different masks),
  output accumulation. Saves only the per-row logsumexp (B, H, 1, N).
- **backward**: recomputes the softmax from q/k/lse, reconstructs the
  identical hash mask, then runs the exact VJP: dv = pd^T do,
  dp = keep*(do v^T)/keep_prob, ds = p*(dp - rowsum(dp*p)),
  dq = ds k*scale, dk = ds^T q*scale, with dk/dv accumulated across query
  tiles in VMEM scratch.

Past the single-pass VMEM budget (N ≳ 16k) key-block-folded variants take
over (see the section below): the forward folds an online softmax over
(TILE, kb) score blocks and the backward keeps one pass using
D = rowsum(do·o) (o joins the residuals only on that path). Past the
FOLDED budget (``_folded_train_ok``; bf16 flagship edge N=20,480, measured
on chip) the dispatch raises a descriptive error — there is no single-chip
fallback at those lengths (dense XLA would need the (B, H, N, N) tensor in
HBM); ``flash_train_supported`` is the public predicate, and the
sequence-parallel ring is the designed path.

Gradients are verified against a dense XLA attention applying the identical
mask (dropout_attention_reference): exact comparison, no finite differences.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128
NEG_INF = float("-inf")


def _keep_mask(seed, b, h, tile_i, shape, rate: float):
    """Counter-based keep mask: murmur3-style fmix over
    (seed, batch, head, global position). Value-based rather than
    generator-based, so the fwd and bwd kernels reconstruct bit-identical
    masks regardless of Mosaic's internal vector layouts (the hardware PRNG's
    bit→element mapping is layout-dependent — observed delivering different
    masks to the two kernels) — and it runs under interpret mode too.

    One hash family, one implementation: this is exactly the full-width
    (col0 = 0) slice of :func:`_keep_mask_block`, so the single-pass and
    key-folded kernels can never desynchronize their bits."""
    return _keep_mask_block(seed, b, h, tile_i * shape[0], 0, shape, rate)


def _keep_mask_block(seed, b, h, row0, col0, shape, rate: float):
    """Same hash family as :func:`_keep_mask` but for a (T, kb) tile at
    global (row0, col0) — bit-identical to the full-width mask's slice, so
    the key-folded kernels and the single-pass kernels draw the same
    bits."""
    T, C = shape
    rows = ((jax.lax.broadcasted_iota(jnp.uint32, (T, 1), 0)
             + jnp.uint32(row0)) * jnp.uint32(0xC2B2AE3D))
    cols = ((jax.lax.broadcasted_iota(jnp.uint32, (1, C), 1)
             + jnp.uint32(col0)) * jnp.uint32(0x27D4EB2F))
    base = (seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
            + jnp.uint32(b * 1024 + h + 1) * jnp.uint32(0x85EBCA77))
    x = (base ^ rows) ^ cols
    x ^= x >> 16
    x *= jnp.uint32(0x85EBCA6B)
    x ^= x >> 13
    x *= jnp.uint32(0xC2B2AE35)
    x ^= x >> 16
    threshold = min(int(rate * (1 << 32)), (1 << 32) - 1)
    return x >= jnp.uint32(threshold)


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, seed_ref, o_ref, lse_ref, *,
                scale: float, rate: float, n_tiles: int):
    b, h = pl.program_id(0), pl.program_id(1)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    key_mask = mask_ref[0] != 0          # (1, N)

    def tile(i, _):
        q = q_ref[0, 0, pl.ds(i * TILE, TILE), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = jnp.where(key_mask, NEG_INF, s)
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=1, keepdims=True)
        p = e / l
        lse_ref[0, 0, :, pl.ds(i * TILE, TILE)] = (
            m + jnp.log(l)).reshape(1, TILE)
        if rate > 0.0:
            keep = _keep_mask(seed_ref[0, 0], b, h, i, p.shape, rate)
            p = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
        o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, 0, pl.ds(i * TILE, TILE), :] = o.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_tiles, tile, 0)


def _bwd_kernel(q_ref, k_ref, v_ref, mask_ref, seed_ref, lse_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                scale: float, rate: float, n_tiles: int):
    b, h = pl.program_id(0), pl.program_id(1)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    key_mask = mask_ref[0] != 0
    dk_acc[...] = jnp.zeros_like(dk_acc)
    dv_acc[...] = jnp.zeros_like(dv_acc)
    inv_keep = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0

    def tile(i, _):
        q = q_ref[0, 0, pl.ds(i * TILE, TILE), :]
        do = do_ref[0, 0, pl.ds(i * TILE, TILE), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        s = jnp.where(key_mask, NEG_INF, s)
        lse = lse_ref[0, 0, :, pl.ds(i * TILE, TILE)].reshape(TILE, 1)
        p = jnp.exp(s - lse)                                  # (T, N)

        dpd = jax.lax.dot_general(do, v.astype(jnp.float32),
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        if rate > 0.0:
            keep = _keep_mask(seed_ref[0, 0], b, h, i, p.shape, rate)
            pd = jnp.where(keep, p * inv_keep, 0.0)
            dp = jnp.where(keep, dpd * inv_keep, 0.0)
        else:
            pd = p
            dp = dpd

        dv_acc[...] += jax.lax.dot_general(
            pd.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))
        dq = jax.lax.dot_general(ds.astype(k.dtype), k,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        dq_ref[0, 0, pl.ds(i * TILE, TILE), :] = dq.astype(dq_ref.dtype)
        dk_acc[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        return 0

    jax.lax.fori_loop(0, n_tiles, tile, 0)
    dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
    dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# Key-block-folded variants for long sequences (same design as the inference
# ops/attention._attention_kernel_folded): K/V stay VMEM-resident while the
# (TILE, N) f32 score tile is replaced by (TILE, kb) blocks. The forward
# folds an online softmax with dropout applied to the OUTPUT accumulation
# only (the denominator keeps raw e — elementwise equal to
# dropout(softmax) @ v, the ring-train identity). The backward uses the
# flash trick D_i = rowsum(do_i · o_i) (= rowsum(dp ⊙ p) even under
# dropout, since o = Σ pd v), so one pass over key blocks suffices.
# ---------------------------------------------------------------------------

from vidsum_tpu.ops.attention import _DEAD, _pick_key_block  # shared


def _fwd_kernel_folded(q_ref, k_ref, v_ref, mask_ref, seed_ref, o_ref,
                       lse_ref, *, scale: float, rate: float, n_tiles: int,
                       kb: int, n_kb: int):
    b, h = pl.program_id(0), pl.program_id(1)
    seed = seed_ref[0, 0]
    inv = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
    Dh = q_ref.shape[-1]

    def tile(i, _):
        q = q_ref[0, 0, pl.ds(i * TILE, TILE), :]

        def fold(j, carry):
            o, m, l = carry
            kblk = k_ref[0, 0, pl.ds(j * kb, kb), :]
            vblk = v_ref[0, 0, pl.ds(j * kb, kb), :]
            mblk = mask_ref[0, :, pl.ds(j * kb, kb)] != 0
            s = jax.lax.dot_general(
                q, kblk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = jnp.where(mblk, NEG_INF, s)
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            dead = m_new < _DEAD
            m_safe = jnp.where(dead, 0.0, m_new)
            e = jnp.where(dead, 0.0, jnp.exp(s - m_safe))
            corr = jnp.where(m < _DEAD, 0.0, jnp.exp(m - m_safe))
            l = l * corr + jnp.sum(e, axis=1, keepdims=True)
            if rate > 0.0:
                keep = _keep_mask_block(seed, b, h, i * TILE, j * kb,
                                        e.shape, rate)
                e_use = jnp.where(keep, e * inv, 0.0)
            else:
                e_use = e
            o = o * corr + jax.lax.dot_general(
                e_use.astype(vblk.dtype), vblk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return o, m_new, l

        o, m, l = jax.lax.fori_loop(
            0, n_kb, fold,
            (jnp.zeros((TILE, Dh), jnp.float32),
             jnp.full((TILE, 1), NEG_INF, jnp.float32),
             jnp.zeros((TILE, 1), jnp.float32)))
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0, pl.ds(i * TILE, TILE), :] = (
            jnp.where(l == 0.0, 0.0, o * (1.0 / l_safe)).astype(o_ref.dtype))
        lse_ref[0, 0, :, pl.ds(i * TILE, TILE)] = (
            jnp.where(l == 0.0, NEG_INF, m + jnp.log(l_safe))
            .reshape(1, TILE))
        return 0

    jax.lax.fori_loop(0, n_tiles, tile, 0)


def _bwd_kernel_folded(q_ref, k_ref, v_ref, mask_ref, seed_ref, lse_ref,
                       do_ref, d_ref, dq_ref, dk_ref, dv_ref,
                       dk_acc, dv_acc, *, scale: float, rate: float,
                       n_tiles: int, kb: int, n_kb: int):
    b, h = pl.program_id(0), pl.program_id(1)
    seed = seed_ref[0, 0]
    inv_keep = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
    Dh = q_ref.shape[-1]
    dk_acc[...] = jnp.zeros_like(dk_acc)
    dv_acc[...] = jnp.zeros_like(dv_acc)

    def tile(i, _):
        sl = pl.ds(i * TILE, TILE)
        q = q_ref[0, 0, sl, :]
        do = do_ref[0, 0, sl, :].astype(jnp.float32)
        lse = lse_ref[0, 0, :, sl].reshape(TILE, 1)
        d_row = d_ref[0, 0, :, sl].reshape(TILE, 1)     # rowsum(do · o)
        lse_safe = jnp.where(lse < _DEAD, 0.0, lse)
        live = lse >= _DEAD

        def fold(j, dq):
            kblk = k_ref[0, 0, pl.ds(j * kb, kb), :]
            vblk = v_ref[0, 0, pl.ds(j * kb, kb), :]
            mblk = mask_ref[0, :, pl.ds(j * kb, kb)] != 0
            s = jax.lax.dot_general(
                q, kblk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = jnp.where(mblk, NEG_INF, s)
            p = jnp.where(live, jnp.exp(s - lse_safe), 0.0)   # (T, kb)
            dpd = jax.lax.dot_general(
                do, vblk.astype(jnp.float32), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if rate > 0.0:
                keep = _keep_mask_block(seed, b, h, i * TILE, j * kb,
                                        p.shape, rate)
                pd = jnp.where(keep, p * inv_keep, 0.0)
                dp = jnp.where(keep, dpd * inv_keep, 0.0)
            else:
                pd = p
                dp = dpd
            dv_acc[pl.ds(j * kb, kb), :] += jax.lax.dot_general(
                pd.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = p * (dp - d_row)
            dq = dq + jax.lax.dot_general(
                ds.astype(kblk.dtype), kblk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            dk_acc[pl.ds(j * kb, kb), :] += jax.lax.dot_general(
                ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            return dq

        dq = jax.lax.fori_loop(0, n_kb, fold,
                               jnp.zeros((TILE, Dh), jnp.float32))
        dq_ref[0, 0, sl, :] = dq.astype(dq_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_tiles, tile, 0)
    dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
    dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _single_pass_ok(N: int, Dh: int, itemsize: int) -> bool:
    """Single-pass budget: q/k/v/o (N, Dh) + (TILE, N) f32 score/mask
    tiles per cell (mirrors ops/attention's 12 MB convention)."""
    return (4 * N * Dh * itemsize + 5 * TILE * N) <= 12 * 1024 * 1024


def _folded_train_ok(N: int, Dh: int, itemsize: int) -> bool:
    """Key-folded TRAIN budget (the backward is the binding pass), modelled
    the way the Mosaic allocator actually charges it — measured on v5e,
    ``scripts/repro_40k_train_compile.py`` (round 3): the seven (N, Dh)
    grid windows (q/k/v/do in, dq/dk/dv out) are lane-padded to 128 and
    DOUBLE-buffered (the round-2 model charged them single-buffered and
    unpadded, which is why N=40,960 passed the guard but the chip refused
    it), plus the two (N, Dh) f32 accumulator scratches (single-buffered,
    same lane padding). The total must fit the kernels' 96 MB
    ``vmem_limit_bytes`` less ~6 MB of register-spill slots and small
    (1, N) lse/mask windows — 90 MB usable. At bf16 / Dh=64 the model is
    4608·N bytes and the chip agrees exactly: N=20,480 compiles and runs
    (94.9 MB scoped incl. 4.9 MB spills), N=22,528 is refused by the
    allocator at 99.0 MB scoped ("exceeded scoped vmem limit by 3.00M").
    There is nothing to demote TO past this (dense training needs the
    (B, H, N, N) weight tensor in HBM, infeasible long before this cap),
    so the dispatch raises instead; the designed path for these shapes is
    sequence parallelism (parallel/seq_forward)."""
    lanes = max(Dh, 128)
    windows = 7 * 2 * N * lanes * itemsize
    scratch = 2 * N * lanes * 4
    return windows + scratch <= 90 * 1024 * 1024


def flash_train_supported(N: int, Dh: int, itemsize: int) -> bool:
    """True when :func:`flash_attention_dropout` has a kernel for this
    shape (single-pass or key-folded). Past it the single-chip dense
    fallback is HBM-infeasible too — use the sequence-parallel ring
    (parallel/seq_forward.py) or a shorter length bucket."""
    return (N % TILE == 0
            and (_single_pass_ok(N, Dh, itemsize)
                 or _folded_train_ok(N, Dh, itemsize)))


def _specs(B, H, N, Dh):
    qkv = pl.BlockSpec((1, 1, N, Dh), lambda b, h: (b, h, 0, 0),
                       memory_space=pltpu.VMEM)
    mask = pl.BlockSpec((1, 1, N), lambda b, h: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    seed = pl.BlockSpec((1, 1), lambda b, h: (0, 0),
                        memory_space=pltpu.SMEM)
    lse = pl.BlockSpec((1, 1, 1, N), lambda b, h: (b, h, 0, 0),
                       memory_space=pltpu.VMEM)
    return qkv, mask, seed, lse


@functools.partial(jax.jit,
                   static_argnames=("scale", "rate", "interpret"))
def _forward(q, k, v, mask, seed, scale, rate, interpret):
    B, H, N, Dh = q.shape
    qkv, mspec, sspec, lspec = _specs(B, H, N, Dh)
    if not _single_pass_ok(N, Dh, q.dtype.itemsize):
        kb = _pick_key_block(N)
        kernel = functools.partial(_fwd_kernel_folded, scale=scale,
                                   rate=rate, n_tiles=N // TILE, kb=kb,
                                   n_kb=N // kb)
        return pl.pallas_call(
            kernel, grid=(B, H),
            in_specs=[qkv, qkv, qkv, mspec, sspec],
            out_specs=(qkv, lspec),
            out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),
                       jax.ShapeDtypeStruct((B, H, 1, N), jnp.float32)),
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
            interpret=interpret,
        )(q, k, v, mask, seed)
    kernel = functools.partial(_fwd_kernel, scale=scale, rate=rate,
                               n_tiles=N // TILE)
    return pl.pallas_call(
        kernel, grid=(B, H),
        in_specs=[qkv, qkv, qkv, mspec, sspec],
        out_specs=(qkv, lspec),
        out_shape=(jax.ShapeDtypeStruct(q.shape, q.dtype),
                   jax.ShapeDtypeStruct((B, H, 1, N), jnp.float32)),
        # long-context: the (TILE, N) f32 score/mask tiles + resident K/V
        # trip the 16 MB default scoped-VMEM cap past N≈8k (observed: the
        # N=10240 train step silently lost this kernel to the XLA dense
        # fallback, 10× slower); v5e has 128 MB VMEM per core
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(q, k, v, mask, seed)


@functools.partial(jax.jit,
                   static_argnames=("scale", "rate", "interpret"))
def _backward_folded(q, k, v, mask, seed, lse, do, o, scale, rate,
                     interpret):
    B, H, N, Dh = q.shape
    qkv, mspec, sspec, lspec = _specs(B, H, N, Dh)
    kb = _pick_key_block(N)
    # the flash backward correction term: rowsum(do · o) == rowsum(dp ⊙ p)
    # even under dropout (o = Σ pd v), so the key loop needs one pass
    d_row = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1)[:, :, None, :]                    # (B, H, 1, N)
    kernel = functools.partial(_bwd_kernel_folded, scale=scale, rate=rate,
                               n_tiles=N // TILE, kb=kb, n_kb=N // kb)
    return pl.pallas_call(
        kernel, grid=(B, H),
        in_specs=[qkv, qkv, qkv, mspec, sspec, lspec, qkv, lspec],
        out_specs=(qkv, qkv, qkv),
        out_shape=tuple(jax.ShapeDtypeStruct(q.shape, q.dtype)
                        for _ in range(3)),
        scratch_shapes=[pltpu.VMEM((N, Dh), jnp.float32),
                        pltpu.VMEM((N, Dh), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(q, k, v, mask, seed, lse, do, d_row)


@functools.partial(jax.jit,
                   static_argnames=("scale", "rate", "interpret"))
def _backward(q, k, v, mask, seed, lse, do, scale, rate, interpret):
    B, H, N, Dh = q.shape
    qkv, mspec, sspec, lspec = _specs(B, H, N, Dh)
    kernel = functools.partial(_bwd_kernel, scale=scale, rate=rate,
                               n_tiles=N // TILE)
    return pl.pallas_call(
        kernel, grid=(B, H),
        in_specs=[qkv, qkv, qkv, mspec, sspec, lspec, qkv],
        out_specs=(qkv, qkv, qkv),
        out_shape=tuple(jax.ShapeDtypeStruct(q.shape, q.dtype)
                        for _ in range(3)),
        scratch_shapes=[pltpu.VMEM((N, Dh), jnp.float32),
                        pltpu.VMEM((N, Dh), jnp.float32)],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(q, k, v, mask, seed, lse, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def flash_attention_dropout(q, k, v, mask, seed, rate: float, scale: float):
    """Fused attention with attention-weight dropout.

    q/k/v (B, H, N, Dh); mask (B, 1, N) int8 (nonzero = padded key);
    seed (1, 1) int32; rate/scale python floats (static). N must be a
    multiple of 128. Returns (B, H, N, Dh) in q's dtype.
    """
    out, _ = _fwd_impl(q, k, v, mask, seed, rate, scale)
    return out


def _interpret():
    """Off-TPU, use the TPU-semantics interpreter (the generic one lacks the
    pltpu PRNG primitives)."""
    if jax.default_backend() == "tpu":
        return False
    return pltpu.InterpretParams()


def _fwd_impl(q, k, v, mask, seed, rate, scale):
    N, Dh = q.shape[2], q.shape[3]
    if (not _single_pass_ok(N, Dh, q.dtype.itemsize)
            and not _folded_train_ok(N, Dh, q.dtype.itemsize)):
        # fail loudly at trace time instead of submitting a kernel the
        # Mosaic allocator cannot place (measured envelope: PERF.md
        # "Single-chip long-context envelope")
        raise ValueError(
            f"flash_attention_dropout: N={N}, Dh={Dh}, "
            f"dtype={q.dtype} exceeds the key-folded train kernels' VMEM "
            f"budget, and a dense-XLA fallback would need the (B, H, N, N) "
            f"attention tensor in HBM — infeasible at this length. Train "
            f"long sequences with the sequence-parallel ring "
            f"(vidsum_tpu.parallel.seq_forward) or a shorter length bucket.")
    o, lse = _forward(q, k, v, mask, seed, scale, rate, _interpret())
    return o, lse


def _vjp_fwd(q, k, v, mask, seed, rate, scale):
    o, lse = _fwd_impl(q, k, v, mask, seed, rate, scale)
    # o is a residual only for the key-folded backward (its D = rowsum(do·o)
    # correction); the single-pass path keeps its original residual set
    folded = not _single_pass_ok(q.shape[2], q.shape[3], q.dtype.itemsize)
    return o, (q, k, v, mask, seed, lse, o if folded else None)


def _vjp_bwd(rate, scale, residuals, do):
    q, k, v, mask, seed, lse, o = residuals
    N, Dh = q.shape[2], q.shape[3]
    if not _single_pass_ok(N, Dh, q.dtype.itemsize):
        dq, dk, dv = _backward_folded(q, k, v, mask, seed, lse,
                                      do.astype(q.dtype), o, scale, rate,
                                      _interpret())
    else:
        dq, dk, dv = _backward(q, k, v, mask, seed, lse, do.astype(q.dtype),
                               scale, rate, _interpret())
    return dq, dk, dv, None, None


flash_attention_dropout.defvjp(_vjp_fwd, _vjp_bwd)


def reference_keep_mask(seed, B: int, H: int, N: int, rate: float):
    """Host-side replica of the kernel's hash mask (for tests): (B, H, N, N)
    boolean keep mask, True = attention weight kept."""
    out = jnp.zeros((B, H, N, N), bool)
    for b in range(B):
        for h in range(H):
            for i in range(N // TILE):
                m = _keep_mask(jnp.asarray(seed, jnp.int32), b, h, i,
                               (TILE, N), rate)
                out = out.at[b, h, i * TILE:(i + 1) * TILE, :].set(m)
    return out


def dropout_attention_reference(q, k, v, bool_mask, keep, rate, scale):
    """Dense XLA attention applying a GIVEN keep mask — the semantics the
    fused kernel must match bit-for-bit up to float tolerance."""
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                   preferred_element_type=jnp.float32) * scale
    s = jnp.where(bool_mask[:, None, None, :], NEG_INF, s)
    p = jax.nn.softmax(s, axis=-1)
    if rate > 0.0:
        p = jnp.where(keep, p / (1.0 - rate), 0.0)
    return jnp.einsum("bhnm,bhmd->bhnd", p.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)
