"""Ring attention: sequence-parallel exact attention over a mesh axis.

The raw-video stretch config (BASELINE.json config 5) scores unsubsampled
videos whose frame counts blow past the scorer's 2.5k-frame envelope; dense
O(N²) attention then exceeds single-chip HBM. Here the sequence is sharded
over a ``seq`` mesh axis: each device keeps its local query block and
rotates K/V (+ the key padding mask) around the ring with
``jax.lax.ppermute`` — the classic Ring Attention scheme — accumulating an
**online softmax** (running max/denominator, flash-style rescaling) so the
result is exact and the N×N matrix never materializes anywhere.

There is no reference analogue (the reference is single-GPU with dense
attention, ``src/model/simnet.py:148-163``); this is greenfield TPU design
per SURVEY.md §2.6/§5. Communication rides ICI; each of the P ring steps
overlaps the (B, H, N/P, N/P) block matmul with the next permute (XLA
schedules the ppermute asynchronously).

Use :func:`ring_attention` inside ``jax.shard_map`` with q/k/v sharded on
their sequence axis; :func:`make_ring_forward` wires it into a standalone
sequence-sharded scorer forward for testing/serving.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = float("-inf")


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   pad_mask: Optional[jnp.ndarray], scale: float,
                   axis_name: str, block_impl: str = "auto") -> jnp.ndarray:
    """Exact attention with q/k/v sharded over ``axis_name``.

    Shapes are per-shard: q/k/v (B, H, Nl, Dh), pad_mask (B, Nl) True=padded.
    Must run inside ``shard_map``/collective context where ``axis_name`` is
    bound. Returns the local (B, H, Nl, Dh) output block.

    :param block_impl: per-ring-step compute. ``'pallas'`` folds each
        arriving K/V block into the online-softmax carry inside one fused
        kernel (the (Nl, Nl) score block never touches HBM — at few shards
        and long sequences the XLA path materializes it, e.g. 105 MB at
        Nl=2560); ``'xla'`` is the einsum path; ``'auto'`` picks pallas on
        TPU for supported shapes.
    """
    n_shards = jax.lax.axis_size(axis_name)
    B, H, Nl, Dh = q.shape
    if pad_mask is None:
        pad_mask = jnp.zeros((B, Nl), bool)

    q32 = q.astype(jnp.float32) * scale
    neg_inf = jnp.float32(-jnp.inf)

    # itemsize 4: the step kernel upcasts K/V to f32 in VMEM regardless of
    # the wire dtype
    supported = _ring_block_supported(Nl, Nl, Dh, 4)
    use_pallas = supported and (
        block_impl == "pallas"
        or (block_impl == "auto" and jax.default_backend() == "tpu"))
    if use_pallas:
        interpret = jax.default_backend() != "tpu"

        def step_p(carry, _):
            o, m, l, kb, vb, mb = carry
            o, m, l = _ring_block_step(q32, kb, vb, mb, o, m, l,
                                       interpret=interpret)
            perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
            kb = jax.lax.ppermute(kb, axis_name, perm)
            vb = jax.lax.ppermute(vb, axis_name, perm)
            mb = jax.lax.ppermute(mb, axis_name, perm)
            return (o, m, l, kb, vb, mb), None

        # derive carries from q so they share its varying-mesh-axes type
        o0 = q32 * 0.0
        m0 = o0.sum(-1, keepdims=True) + neg_inf                # (B,H,Nl,1)
        l0 = o0.sum(-1, keepdims=True)
        (o, _, l, _, _, _), _ = jax.lax.scan(
            step_p, (o0, m0, l0, k, v, pad_mask), None, length=n_shards)
        return _normalize(o, l, q.dtype)

    def step(carry, _):
        o, m, l, kb, vb, mb = carry
        s = jnp.einsum("bhnd,bhmd->bhnm", q32, kb.astype(jnp.float32))
        s = jnp.where(mb[:, None, None, :], neg_inf, s)

        m_new = jnp.maximum(m, s.max(axis=-1))
        # rows that have seen no unmasked key yet keep m = -inf; route them
        # around the exp so no NaNs are produced
        dead = jnp.isneginf(m_new)
        p = jnp.where(dead[..., None], 0.0,
                      jnp.exp(s - jnp.where(dead, 0.0, m_new)[..., None]))
        corr = jnp.where(jnp.isneginf(m), 0.0,
                         jnp.exp(m - jnp.where(dead, 0.0, m_new)))
        l = l * corr + p.sum(axis=-1)
        o = o * corr[..., None] + jnp.einsum(
            "bhnm,bhmd->bhnd", p, vb.astype(jnp.float32))

        perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        mb = jax.lax.ppermute(mb, axis_name, perm)
        return (o, m_new, l, kb, vb, mb), None

    # derive the carries from q so they carry the same varying-mesh-axes
    # type as the loop outputs (jax>=0.7 shard_map typing)
    o0 = q32 * 0.0
    m0 = o0[..., 0] + neg_inf
    l0 = o0[..., 0]
    (o, _, l, _, _, _), _ = jax.lax.scan(
        step, (o0, m0, l0, k, v, pad_mask), None, length=n_shards)
    return _normalize(o, l[..., None], q.dtype)


def _normalize(o, l, dtype):
    """o / l with a safe denominator: ``where(l==0, 0, o/l)`` alone still
    divides by zero inside the VJP (0/0 → NaN grads for fully-padded rows,
    which pmean would spread into every parameter). ``l`` arrives with a
    trailing singleton dim."""
    l_safe = jnp.where(l == 0.0, 1.0, l)
    return jnp.where(l == 0.0, 0.0, o / l_safe).astype(dtype)


TILE_Q = 128
_DEAD = -1e37  # threshold: anything below is "no unmasked key seen yet"


def _ring_block_kernel(q_ref, k_ref, v_ref, mask_ref, oin_ref, min_ref,
                       lin_ref, oout_ref, mout_ref, lout_ref, *,
                       n_q_tiles: int):
    """One (batch, head) cell of one ring step: fold the arriving K/V block
    into the online-softmax carry (o, m, l) without the (Nq, Nk) score
    block ever leaving VMEM. Carries are (1, 1, N, 1) f32; q arrives
    pre-scaled in f32."""
    import jax.numpy as jnp  # local: kernel traced by Mosaic

    k = k_ref[0, 0]                       # (Nk, Dh)
    v = v_ref[0, 0]                       # (Nk, Dh)
    key_mask = mask_ref[0] != 0           # (1, Nk), True = padded

    def tile(i, _):
        sl = pl.ds(i * TILE_Q, TILE_Q)
        q = q_ref[0, 0, sl, :]                                 # (Tq, Dh)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                # (Tq, Nk)
        s = jnp.where(key_mask, NEG_INF, s)

        m_prev = min_ref[0, 0, sl, :]                          # (Tq, 1)
        l_prev = lin_ref[0, 0, sl, :]                          # (Tq, 1)
        o_prev = oin_ref[0, 0, sl, :]                          # (Tq, Dh)

        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        dead = m_new < _DEAD                                   # (Tq, 1)
        m_safe = jnp.where(dead, 0.0, m_new)
        p = jnp.where(dead, 0.0, jnp.exp(s - m_safe))          # (Tq, Nk)
        corr = jnp.where(m_prev < _DEAD, 0.0, jnp.exp(m_prev - m_safe))
        l_new = l_prev * corr + jnp.sum(p, axis=1, keepdims=True)
        o_new = o_prev * corr + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        oout_ref[0, 0, sl, :] = o_new
        mout_ref[0, 0, sl, :] = m_new
        lout_ref[0, 0, sl, :] = l_new
        return 0

    jax.lax.fori_loop(0, n_q_tiles, tile, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _ring_block_step(q32, kb, vb, mb, o, m, l, interpret: bool):
    """Pallas ring step: q32 (B,H,Nq,Dh) f32 pre-scaled; kb/vb (B,H,Nk,Dh);
    mb (B,Nk) bool; carries o (B,H,Nq,Dh) f32, m/l (B,H,Nq,1) f32.
    Returns updated (o, m, l)."""
    B, H, Nq, Dh = q32.shape
    Nk = kb.shape[2]
    # Upcast K/V at the kernel boundary: matches the XLA step's
    # .astype(float32) semantics exactly and avoids the (unvalidated on
    # chip) mixed f32×bf16 dot_general inside Mosaic. The ppermute in the
    # caller still moves bf16 over ICI; only the VMEM-resident block pays
    # the f32 cost (accounted for in _ring_block_supported via itemsize=4).
    kb = kb.astype(jnp.float32)
    vb = vb.astype(jnp.float32)

    grid = (B, H)
    q_spec = pl.BlockSpec((1, 1, Nq, Dh), lambda b, h: (b, h, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, 1, Nk, Dh), lambda b, h: (b, h, 0, 0),
                           memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, 1, Nk), lambda b, h: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    carry_spec = pl.BlockSpec((1, 1, Nq, 1), lambda b, h: (b, h, 0, 0),
                              memory_space=pltpu.VMEM)

    kernel = functools.partial(_ring_block_kernel, n_q_tiles=Nq // TILE_Q)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec, mask_spec, q_spec, carry_spec,
                  carry_spec],
        out_specs=[q_spec, carry_spec, carry_spec],
        out_shape=[jax.ShapeDtypeStruct(o.shape, jnp.float32),
                   jax.ShapeDtypeStruct(m.shape, jnp.float32),
                   jax.ShapeDtypeStruct(l.shape, jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Nq * Nk * Dh,
            bytes_accessed=(3 * B * H * Nq * Dh + 2 * B * H * Nk * Dh) * 4,
            transcendentals=B * H * Nq * Nk,
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(q32, kb, vb, mb.astype(jnp.int8)[:, None, :], o, m, l)


def _ring_block_supported(Nq: int, Nk: int, Dh: int, itemsize: int) -> bool:
    """Shapes the fused step kernel handles; others use the jnp step.
    VMEM per cell: q/o_in/o_out (Nq,Dh) f32 + k/v (Nk,Dh) + score tile."""
    vmem = (3 * Nq * Dh * 4 + 2 * Nk * Dh * itemsize
            + TILE_Q * Nk * 4 + 4 * Nq * 4)
    return (Nq % TILE_Q == 0 and Nk % TILE_Q == 0
            and vmem <= 12 * 1024 * 1024)


def _fmix_keep(x, rate: float):
    """Murmur-style finalizer + threshold shared by the hash-mask family
    (same arithmetic as ``ops/block_train._hash_keep``; golden-pinned in
    tests/test_seq_train.py)."""
    x ^= x >> 16
    x *= jnp.uint32(0x85EBCA6B)
    x ^= x >> 13
    x *= jnp.uint32(0xC2B2AE35)
    x ^= x >> 16
    threshold = min(int(rate * (1 << 32)), (1 << 32) - 1)
    return x >= jnp.uint32(threshold)


def ring_hash_keep(seed, b0, q0, k0, shape, rate: float):
    """Boolean keep mask for attention-weight dropout over GLOBAL
    coordinates: ``shape`` is (B, H, Nq, Nk) with batch offset ``b0``, query
    offset ``q0`` and key offset ``k0``. Same counter-based mixing family as
    the fused kernels' in-kernel masks (``ops/block_train._hash_keep``, site
    = head index) — the mask for a (b, h, query, key) pair depends only on
    its global coordinates and the seed, so it is identical on every ring
    shard and invariant to the mesh shape."""
    B, H, Nq, Nk = shape
    # separable mixing on per-axis vectors + broadcast combine — bit-
    # identical to mixing full-shape iotas (XOR associativity; the sums/
    # products are elementwise equal), far fewer full-shape VPU ops
    ib = jax.lax.broadcasted_iota(jnp.uint32, (B, 1, 1, 1), 0)
    ih = jax.lax.broadcasted_iota(jnp.uint32, (1, H, 1, 1), 1)
    ir = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, Nq, 1), 2)
    ic = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, 1, Nk), 3)
    seed = jnp.asarray(seed).astype(jnp.uint32)
    base = (seed * jnp.uint32(0x9E3779B1)
            + (ih * jnp.uint32(131071) + jnp.uint32(17)) * jnp.uint32(0x85EBCA77)
            + (jnp.uint32(b0) + ib + jnp.uint32(1)) * jnp.uint32(0x27220A95))
    x = (base ^ ((jnp.uint32(q0) + ir) * jnp.uint32(0xC2B2AE3D))
         ^ ((jnp.uint32(k0) + ic) * jnp.uint32(0x27D4EB2F)))
    return _fmix_keep(x, rate)


def hash_keep3d(seed, site: int, b0, row0, shape, rate: float):
    """Keep mask for a position-local dropout site over GLOBAL coordinates:
    ``shape`` = (B, N, C) with global batch offset ``b0`` and global row
    offset ``row0``. Per fixed batch index this is bit-identical to the
    fused kernels' ``ops/block_train._hash_keep`` — same mixing, same site
    constants — so masks agree across shardings and with a dense replay."""
    B, N, C = shape
    ib = jax.lax.broadcasted_iota(jnp.uint32, (B, 1, 1), 0)
    rows = ((jax.lax.broadcasted_iota(jnp.uint32, (1, N, 1), 1)
             + jnp.uint32(row0)) * jnp.uint32(0xC2B2AE3D))
    cols = (jax.lax.broadcasted_iota(jnp.uint32, (1, 1, C), 2)
            * jnp.uint32(0x27D4EB2F))
    seed = jnp.asarray(seed).astype(jnp.uint32)
    base = (seed * jnp.uint32(0x9E3779B1)
            + jnp.uint32(site * 131071 + 17) * jnp.uint32(0x85EBCA77)
            + (jnp.uint32(b0) + ib + jnp.uint32(1)) * jnp.uint32(0x27220A95))
    x = (base ^ rows) ^ cols
    return _fmix_keep(x, rate)


def ring_attention_train(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         pad_mask: Optional[jnp.ndarray], scale: float,
                         axis_name: str, seed, rate: float,
                         b0=0, block_impl: str = "auto") -> jnp.ndarray:
    """Trainable exact ring attention: forward like :func:`ring_attention`
    plus attention-weight dropout, memory-safe under autodiff.

    - **Dropout on softmax weights** (reference ``simnet.py:162``): the keep
      mask comes from :func:`ring_hash_keep` over global (b, h, query, key)
      coordinates. The unnormalized probabilities ``p`` are masked for the
      output accumulation while the denominator ``l`` accumulates unmasked
      ``p`` — elementwise this equals ``dropout(softmax(s)) @ v`` exactly.
    - **Backward**: each ring step is wrapped in ``jax.checkpoint`` so
      reverse-mode recomputes the (B, H, Nl, Nl) score block per step
      instead of storing all of them — activation memory stays O(N/P · D)
      per device, the whole point of the ring. The mask regenerates
      identically from the same coordinates (no mask tensor is ever stored).
    - ``b0``: global batch offset of this shard (nonzero under data
      parallelism) so masks stay coordinate-absolute.
    """
    n_shards = jax.lax.axis_size(axis_name)
    B, H, Nl, Dh = q.shape
    if pad_mask is None:
        pad_mask = jnp.zeros((B, Nl), bool)

    # fused path (VERDICT r1 #3): custom-VJP ring whose forward AND
    # backward are per-step Pallas kernels — the (Nl, Nl) score block never
    # touches HBM in training either (grad parity vs this XLA path in
    # tests/test_seq_train.py and scripts/validate_on_tpu.py)
    use_pallas = _ring_train_supported(Nl, Nl, Dh) and (
        block_impl == "pallas"
        or (block_impl == "auto" and jax.default_backend() == "tpu"))
    if use_pallas:
        interpret = jax.default_backend() != "tpu"
        return _ring_fused_train(scale, axis_name, rate, interpret,
                                 q, k, v, pad_mask, seed,
                                 jnp.asarray(b0, jnp.int32))

    s_idx = jax.lax.axis_index(axis_name)
    q0 = s_idx * Nl
    q32 = q.astype(jnp.float32) * scale
    neg_inf = jnp.float32(-jnp.inf)

    def step(carry, t):
        o, m, l, kb, vb, mb = carry
        s = jnp.einsum("bhnd,bhmd->bhnm", q32, kb.astype(jnp.float32))
        s = jnp.where(mb[:, None, None, :], neg_inf, s)

        m_new = jnp.maximum(m, s.max(axis=-1))
        dead = jnp.isneginf(m_new)
        p = jnp.where(dead[..., None], 0.0,
                      jnp.exp(s - jnp.where(dead, 0.0, m_new)[..., None]))
        corr = jnp.where(jnp.isneginf(m), 0.0,
                         jnp.exp(m - jnp.where(dead, 0.0, m_new)))
        l_new = l * corr + p.sum(axis=-1)
        # kb originated on shard (s_idx - t) mod P → its global key offset
        k0 = ((s_idx - t) % n_shards) * Nl
        if rate > 0.0:
            keep = ring_hash_keep(seed, b0, q0, k0, p.shape, rate)
            p_use = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
        else:
            p_use = p
        o = o * corr[..., None] + jnp.einsum(
            "bhnm,bhmd->bhnd", p_use, vb.astype(jnp.float32))

        perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        mb = jax.lax.ppermute(mb, axis_name, perm)
        return (o, m_new, l_new, kb, vb, mb), None

    o0 = q32 * 0.0
    m0 = o0[..., 0] + neg_inf
    l0 = o0[..., 0]
    (o, _, l, _, _, _), _ = jax.lax.scan(
        jax.checkpoint(step), (o0, m0, l0, k, v, pad_mask),
        jnp.arange(n_shards))
    return _normalize(o, l[..., None], q.dtype)


def make_ring_forward(mesh: Mesh, scale: float, seq_axis: str = "seq",
                      block_impl: str = "auto"):
    """A jitted sequence-sharded attention forward for a (data, seq) mesh:
    q/k/v (B, H, N, Dh) and pad_mask (B, N) arrive whole; batch shards over
    ``data``, sequence over ``seq``. ``block_impl`` as in
    :func:`ring_attention`."""
    qkv_spec = P("data", None, seq_axis, None)
    mask_spec = P("data", seq_axis)

    @jax.jit
    def fwd(q, k, v, pad_mask):
        shard = jax.shard_map(
            functools.partial(ring_attention, scale=scale,
                              axis_name=seq_axis, block_impl=block_impl),
            mesh=mesh,
            in_specs=(qkv_spec, qkv_spec, qkv_spec, mask_spec),
            out_specs=qkv_spec,
            check_vma=False,  # pallas_call outputs carry no vma type
        )
        return shard(q, k, v, pad_mask)

    return fwd


# ---------------------------------------------------------------------------
# Fused TRAINABLE ring step (VERDICT r1 #3): forward kernel with in-kernel
# hash dropout + flash-style backward kernel, assembled into a custom VJP so
# sequence-parallel training never materializes the (Nl, Nl) score block in
# HBM either. The XLA path above (ring_attention_train) stays the oracle;
# grads are validated against it in tests/test_seq_train.py and on chip by
# scripts/validate_on_tpu.py.

def _ring_keep_tile(seed, b_global, h, q_start, k0, shape, rate: float):
    """In-kernel keep mask for a (Tq, Nk) score tile — bit-identical to
    :func:`ring_hash_keep` at global coordinates (rows q_start+i, cols
    k0+j). All scalars arrive as traced int32; arithmetic is uint32."""
    T, N = shape
    # separable mixing (see ops/block_train._hash_keep): bit-identical to
    # full-tile iota products, ~6 fewer full-tile VPU ops per mask
    rows = ((jax.lax.broadcasted_iota(jnp.uint32, (T, 1), 0)
             + q_start.astype(jnp.uint32)) * jnp.uint32(0xC2B2AE3D))
    cols = ((jax.lax.broadcasted_iota(jnp.uint32, (1, N), 1)
             + k0.astype(jnp.uint32)) * jnp.uint32(0x27D4EB2F))
    base = (seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
            + (h.astype(jnp.uint32) * jnp.uint32(131071) + jnp.uint32(17))
            * jnp.uint32(0x85EBCA77)
            + (b_global.astype(jnp.uint32) + jnp.uint32(1))
            * jnp.uint32(0x27220A95))
    x = (base ^ rows) ^ cols
    return _fmix_keep(x, rate)


def _ring_train_fwd_kernel(q_ref, k_ref, v_ref, mask_ref, info_ref,
                           oin_ref, min_ref, lin_ref,
                           oout_ref, mout_ref, lout_ref, *,
                           n_q_tiles: int, rate: float):
    """One (batch, head) cell of one TRAIN ring step: like
    ``_ring_block_kernel`` but the output accumulation applies
    attention-weight dropout (keep mask from global coordinates) while the
    denominator keeps raw probabilities — elementwise equal to
    ``dropout(softmax(s)) @ v`` (reference ``simnet.py:162``)."""
    import jax.numpy as jnp  # local: kernel traced by Mosaic

    k = k_ref[0, 0]
    v = v_ref[0, 0]
    key_mask = mask_ref[0] != 0
    seed = info_ref[0, 0]
    b_global = info_ref[0, 1] + pl.program_id(0)
    h = pl.program_id(1)
    q0 = info_ref[0, 2]
    k0 = info_ref[0, 3]

    def tile(i, _):
        sl = pl.ds(i * TILE_Q, TILE_Q)
        q = q_ref[0, 0, sl, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = jnp.where(key_mask, NEG_INF, s)

        m_prev = min_ref[0, 0, sl, :]
        l_prev = lin_ref[0, 0, sl, :]
        o_prev = oin_ref[0, 0, sl, :]

        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        dead = m_new < _DEAD
        m_safe = jnp.where(dead, 0.0, m_new)
        p = jnp.where(dead, 0.0, jnp.exp(s - m_safe))
        corr = jnp.where(m_prev < _DEAD, 0.0, jnp.exp(m_prev - m_safe))
        l_new = l_prev * corr + jnp.sum(p, axis=1, keepdims=True)
        if rate > 0.0:
            keep = _ring_keep_tile(seed, b_global, h, q0 + i * TILE_Q,
                                   k0, p.shape, rate)
            p_use = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
        else:
            p_use = p
        o_new = o_prev * corr + jax.lax.dot_general(
            p_use, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        oout_ref[0, 0, sl, :] = o_new
        mout_ref[0, 0, sl, :] = m_new
        lout_ref[0, 0, sl, :] = l_new
        return 0

    jax.lax.fori_loop(0, n_q_tiles, tile, 0)


def _ring_train_bwd_kernel(q_ref, k_ref, v_ref, g_ref, d_ref, m_ref, l_ref,
                           mask_ref, info_ref, dqin_ref, dkin_ref, dvin_ref,
                           dqout_ref, dkout_ref, dvout_ref, *,
                           n_q_tiles: int, rate: float):
    """Backward of one ring step, flash-style: recompute the score tile
    from q32/k and the saved per-row (m, l), regenerate the dropout mask
    from coordinates, and accumulate

        dv_j += sum_i w~_ij g_i          (w~ = dropped normalized weight)
        ds_ij = (e_ij/l_i) (keep inv (g_i.v_j) - D_i),  D = rowsum(g*out)
        dq32_i += ds_ij k_j;   dk_j += ds_ij q32_i

    The (Tq, Nk) tiles live only in VMEM/registers — no score block in HBM.
    """
    import jax.numpy as jnp  # local: kernel traced by Mosaic

    k = k_ref[0, 0]                       # (Nk, Dh) f32
    v = v_ref[0, 0]
    key_mask = mask_ref[0] != 0           # (1, Nk)
    seed = info_ref[0, 0]
    b_global = info_ref[0, 1] + pl.program_id(0)
    h = pl.program_id(1)
    q0 = info_ref[0, 2]
    k0 = info_ref[0, 3]
    inv = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0

    dkout_ref[0, 0] = dkin_ref[0, 0]
    dvout_ref[0, 0] = dvin_ref[0, 0]

    def tile(i, _):
        sl = pl.ds(i * TILE_Q, TILE_Q)
        q = q_ref[0, 0, sl, :]                                  # (Tq, Dh)
        g = g_ref[0, 0, sl, :]
        m_row = m_ref[0, 0, sl, :]                              # (Tq, 1)
        l_row = l_ref[0, 0, sl, :]
        d_row = d_ref[0, 0, sl, :]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                 # (Tq, Nk)
        dead = m_row < _DEAD
        m_safe = jnp.where(dead, 0.0, m_row)
        e = jnp.where(key_mask | dead, 0.0, jnp.exp(s - m_safe))
        l_safe = jnp.where(l_row == 0.0, 1.0, l_row)
        w = e / l_safe                                          # (Tq, Nk)
        if rate > 0.0:
            keep = _ring_keep_tile(seed, b_global, h, q0 + i * TILE_Q,
                                   k0, w.shape, rate)
            kp = jnp.where(keep, jnp.float32(inv), 0.0)
        else:
            kp = jnp.float32(1.0)
        wd = w * kp                                             # dropped w~

        dvout_ref[0, 0] += jax.lax.dot_general(
            wd, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                 # (Nk, Dh)
        dp = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                 # (Tq, Nk)
        ds = w * (kp * dp - d_row)
        dqout_ref[0, 0, sl, :] = dqin_ref[0, 0, sl, :] + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dkout_ref[0, 0] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, n_q_tiles, tile, 0)


def _ring_train_supported(Nq: int, Nk: int, Dh: int) -> bool:
    """Shapes the fused TRAIN step handles. Bwd VMEM per cell: q/g/dq_in/
    dq_out (Nq,Dh) + k/v/dk_in/dk_out/dv_in/dv_out (Nk,Dh), all f32, plus
    two (Tq, Nk) tiles and five (Nq,1) rows."""
    vmem = ((4 * Nq * Dh + 6 * Nk * Dh) * 4
            + 3 * TILE_Q * Nk * 4 + 6 * Nq * 4)
    return (Nq % TILE_Q == 0 and Nk % TILE_Q == 0
            and vmem <= 12 * 1024 * 1024)


@functools.partial(jax.jit, static_argnames=("rate", "interpret"))
def _ring_train_step(q32, kb, vb, mb, info, o, m, l, rate: float,
                     interpret: bool):
    """Pallas TRAIN ring step. q32 (B,H,Nq,Dh) f32 pre-scaled; kb/vb f32;
    mb (B,Nk) bool; info (1,4) int32 [seed, b0, q0, k0]; carries as in the
    inference step. Returns updated (o, m, l)."""
    B, H, Nq, Dh = q32.shape
    Nk = kb.shape[2]

    grid = (B, H)
    q_spec = pl.BlockSpec((1, 1, Nq, Dh), lambda b, h: (b, h, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, 1, Nk, Dh), lambda b, h: (b, h, 0, 0),
                           memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, 1, Nk), lambda b, h: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    carry_spec = pl.BlockSpec((1, 1, Nq, 1), lambda b, h: (b, h, 0, 0),
                              memory_space=pltpu.VMEM)
    info_spec = pl.BlockSpec((1, 4), lambda b, h: (0, 0),
                             memory_space=pltpu.SMEM)

    kernel = functools.partial(_ring_train_fwd_kernel,
                               n_q_tiles=Nq // TILE_Q, rate=rate)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec, mask_spec, info_spec,
                  q_spec, carry_spec, carry_spec],
        out_specs=[q_spec, carry_spec, carry_spec],
        out_shape=[jax.ShapeDtypeStruct(o.shape, jnp.float32),
                   jax.ShapeDtypeStruct(m.shape, jnp.float32),
                   jax.ShapeDtypeStruct(l.shape, jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Nq * Nk * Dh,
            bytes_accessed=(3 * B * H * Nq * Dh + 2 * B * H * Nk * Dh) * 4,
            transcendentals=B * H * Nq * Nk,
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(q32, kb, vb, mb.astype(jnp.int8)[:, None, :], info, o, m, l)


@functools.partial(jax.jit, static_argnames=("rate", "interpret"))
def _ring_train_step_bwd(q32, kb, vb, g, d, m, l, mb, info, dq, dk, dv,
                         rate: float, interpret: bool):
    """Pallas backward ring step: accumulates into (dq, dk, dv)."""
    B, H, Nq, Dh = q32.shape
    Nk = kb.shape[2]

    grid = (B, H)
    q_spec = pl.BlockSpec((1, 1, Nq, Dh), lambda b, h: (b, h, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, 1, Nk, Dh), lambda b, h: (b, h, 0, 0),
                           memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, 1, Nk), lambda b, h: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, 1, Nq, 1), lambda b, h: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)
    info_spec = pl.BlockSpec((1, 4), lambda b, h: (0, 0),
                             memory_space=pltpu.SMEM)

    kernel = functools.partial(_ring_train_bwd_kernel,
                               n_q_tiles=Nq // TILE_Q, rate=rate)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, row_spec, row_spec,
                  row_spec, mask_spec, info_spec, q_spec, kv_spec, kv_spec],
        out_specs=[q_spec, kv_spec, kv_spec],
        out_shape=[jax.ShapeDtypeStruct(dq.shape, jnp.float32),
                   jax.ShapeDtypeStruct(dk.shape, jnp.float32),
                   jax.ShapeDtypeStruct(dv.shape, jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=10 * B * H * Nq * Nk * Dh,
            bytes_accessed=(7 * B * H * Nq * Dh + 6 * B * H * Nk * Dh) * 4,
            transcendentals=B * H * Nq * Nk,
        ),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(q32, kb, vb, g, d, m, l, mb.astype(jnp.int8)[:, None, :], info,
      dq, dk, dv)


def _ring_train_forward_scan(scale, axis_name, rate, interpret,
                             q, k, v, pad_mask, seed, b0):
    """Forward ring with the fused train step. Returns (out, m, l) with
    ``out`` normalized in q.dtype and (m, l) the per-row online-softmax
    stats the backward needs."""
    n_shards = jax.lax.axis_size(axis_name)
    B, H, Nl, Dh = q.shape
    s_idx = jax.lax.axis_index(axis_name)
    q0 = s_idx * Nl
    q32 = q.astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    neg_inf = jnp.float32(-jnp.inf)

    def step(carry, t):
        o, m, l, kb, vb, mb = carry
        k0 = ((s_idx - t) % n_shards) * Nl
        info = jnp.stack([jnp.asarray(seed, jnp.int32),
                          jnp.asarray(b0, jnp.int32),
                          q0.astype(jnp.int32),
                          k0.astype(jnp.int32)]).reshape(1, 4)
        o, m, l = _ring_train_step(q32, kb, vb, mb, info, o, m, l,
                                   rate=rate, interpret=interpret)
        perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        mb = jax.lax.ppermute(mb, axis_name, perm)
        return (o, m, l, kb, vb, mb), None

    o0 = q32 * 0.0
    m0 = o0.sum(-1, keepdims=True) + neg_inf
    l0 = o0.sum(-1, keepdims=True)
    (o, m, l, _, _, _), _ = jax.lax.scan(
        step, (o0, m0, l0, kf, vf, pad_mask), jnp.arange(n_shards))
    return _normalize(o, l, q.dtype), m, l


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _ring_fused_train(scale, axis_name, rate, interpret,
                      q, k, v, pad_mask, seed, b0):
    out, _, _ = _ring_train_forward_scan(scale, axis_name, rate, interpret,
                                         q, k, v, pad_mask, seed, b0)
    return out


def _ring_fused_train_fwd(scale, axis_name, rate, interpret,
                          q, k, v, pad_mask, seed, b0):
    out, m, l = _ring_train_forward_scan(scale, axis_name, rate, interpret,
                                         q, k, v, pad_mask, seed, b0)
    return out, (q, k, v, pad_mask, seed, b0, out, m, l)


def _ring_fused_train_bwd(scale, axis_name, rate, interpret, res, g):
    q, k, v, pad_mask, seed, b0, out, m, l = res
    n_shards = jax.lax.axis_size(axis_name)
    B, H, Nl, Dh = q.shape
    s_idx = jax.lax.axis_index(axis_name)
    q0 = s_idx * Nl
    q32 = q.astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    # normalization folded into the weights: g here is d/d(out_normalized);
    # the kernel works with w~ = e*keep*inv/l directly, so l carries the
    # normalization and D = rowsum(g * out) (out already normalized)
    d_row = jnp.sum(g32 * out.astype(jnp.float32), axis=-1, keepdims=True)

    def step(carry, t):
        dq, kb, vb, mb, dkb, dvb = carry
        k0 = ((s_idx - t) % n_shards) * Nl
        info = jnp.stack([jnp.asarray(seed, jnp.int32),
                          jnp.asarray(b0, jnp.int32),
                          q0.astype(jnp.int32),
                          k0.astype(jnp.int32)]).reshape(1, 4)
        dq, dkb, dvb = _ring_train_step_bwd(
            q32, kb, vb, g32, d_row, m, l, mb, info, dq, dkb, dvb,
            rate=rate, interpret=interpret)
        perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        mb = jax.lax.ppermute(mb, axis_name, perm)
        dkb = jax.lax.ppermute(dkb, axis_name, perm)
        dvb = jax.lax.ppermute(dvb, axis_name, perm)
        return (dq, kb, vb, mb, dkb, dvb), None

    zero_q = q32 * 0.0
    zero_kv = kf * 0.0
    (dq, _, _, _, dk, dv), _ = jax.lax.scan(
        step, (zero_q, kf, vf, pad_mask, zero_kv, zero_kv),
        jnp.arange(n_shards))
    # after n_shards rotations every (dkb, dvb) block is back at its owner
    dq = (dq * jnp.float32(scale)).astype(q.dtype)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype), None, None, None


_ring_fused_train.defvjp(_ring_fused_train_fwd, _ring_fused_train_bwd)
