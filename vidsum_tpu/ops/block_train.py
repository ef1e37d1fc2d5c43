"""Trainable fused encoder block: fwd AND bwd as Pallas kernels.

One grid cell per batch element runs the whole post-LN block — QKV, per-head
attention with in-kernel dropout, projection, dropout+residual+LN1, MLP with
post-ReLU dropout, dropout+residual+LN2 — on-chip, and the backward kernel
recomputes the forward per query tile (activations are never stored: the
only residual is the input x) and emits exact gradients for x and every
parameter. All four dropout sites use counter-based hash masks (murmur-style
fmix over seed/site/batch/position — see ``ops/attention_train.py`` for why
the hardware PRNG cannot be used), so the backward reconstructs bit-identical
masks and the whole op is verifiable against a dense XLA block applying the
same masks (``block_reference_with_masks``).

Parameter gradients accumulate across the sequential grid (one VMEM-resident
output block revisited per batch element, initialized at b == 0).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vidsum_tpu.ops.block_kernel import _pick_group

TILE = 128
LN_EPS = 1e-5
NEG_INF = float("-inf")

# dropout sites: attention head h hashes with site == S_ATTN*8 + h == h, so
# heads occupy sites [0, num_heads); the remaining sites start at 32 to stay
# disjoint for any plausible head count. (A previous numbering of 1/2/3
# collided with heads 1-3, making those heads' attention masks equal to the
# res1/mlp/res2 masks on overlapping coordinates — caught by
# tests/test_dropout_stats.py::test_independence_across_sites.)
S_ATTN, S_RES1, S_MLP, S_RES2 = 0, 32, 33, 34
MAX_HASH_HEADS = 32

# flat parameter order (all 2-D weights (in, out), 1-D biases/LN vectors)
PARAM_NAMES = ("wq", "bq", "wk", "bk", "wv", "bv", "wp", "bp",
               "ln1s", "ln1b", "wf1", "bf1", "wf2", "bf2", "ln2s", "ln2b")


def _hash_keep(seed, site, b, row0, shape, rate: float):
    """Keep mask for a (T, cols) tile whose global rows start at row0.

    The coordinate mixing is separable, so the row/col multiplies run on
    (T, 1) / (1, C) vectors and a single broadcast XOR assembles the full
    (T, C) lattice — bit-identical to multiplying full-tile iotas (the
    products are elementwise equal and XOR is associative) but it drops
    ~6 full-tile VPU ops per mask, leaving only the xor + fmix finalizer
    at tile size. Kept as a bit-identical simplification; measured
    perf-neutral at the flagship shape (PERF.md round-2 experiments: the
    hash arithmetic hides under the MXU pipeline, and the dropout
    family's ~1.0 ms of the 5.1 ms step is dominated by the apply ops,
    not mask generation).
    """
    T, C = shape
    base = (seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
            + jnp.uint32(site * 131071 + 17) * jnp.uint32(0x85EBCA77)
            + jnp.uint32(b + 1) * jnp.uint32(0x27220A95))
    rows = ((jax.lax.broadcasted_iota(jnp.uint32, (T, 1), 0)
             + jnp.uint32(row0)) * jnp.uint32(0xC2B2AE3D))
    cols = (jax.lax.broadcasted_iota(jnp.uint32, (1, C), 1)
            * jnp.uint32(0x27D4EB2F))
    x = (base ^ rows) ^ cols
    x ^= x >> 16
    x *= jnp.uint32(0x85EBCA6B)
    x ^= x >> 13
    x *= jnp.uint32(0xC2B2AE35)
    x ^= x >> 16
    threshold = min(int(rate * (1 << 32)), (1 << 32) - 1)
    return x >= jnp.uint32(threshold)


def _drop(x, keep, rate: float):
    return jnp.where(keep, x * (1.0 / (1.0 - rate)), 0.0) if rate > 0.0 else x


def _ln_fwd(z, scale, bias):
    mu = z.mean(axis=-1, keepdims=True)
    var = ((z - mu) ** 2).mean(axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + LN_EPS)
    xhat = (z - mu) * inv
    return xhat * scale + bias, xhat, inv


def _ln_bwd(dy, xhat, inv, scale):
    """Returns (dz, dscale, dbias)."""
    d = xhat.shape[-1]
    g = dy * scale
    dz = inv * (g - g.mean(axis=-1, keepdims=True)
                - xhat * (g * xhat).mean(axis=-1, keepdims=True))
    return dz, (dy * xhat).sum(axis=0), dy.sum(axis=0)


def _mm(a, b, ta=False, tb=False, cd=None):
    """MXU matmul with f32 accumulation; ``cd`` casts the operands first.

    The kernels pin cd=f32: a bf16-operand variant was measured SLOWER on
    v5e at these tile sizes (train step 10.11 ms vs 6.93 ms at B=32/N=512/
    d=256) — the per-tile f32→bf16 casts and bf16 VMEM relayouts cost more
    than the multi-pass f32 MXU saves. bf16 *inputs* are still accepted
    (cast on load); precision is therefore >= the XLA bf16 path and the
    reference's fp16 AMP (src/train.py:38)."""
    if cd is not None:
        a = a.astype(cd)
        b = b.astype(cd)
    dims = (((0,) if ta else (1,), (1,) if tb else (0,)), ((), ()))
    return jax.lax.dot_general(a, b, dims, preferred_element_type=jnp.float32)


def _tile_forward(x_ref, w, key_mask, seed, b, i, k, v, num_heads, scale,
                  rate, cd, tile=TILE, full=True):
    """Recompute-or-compute all forward intermediates for query tile i
    (``tile`` rows starting at i*tile; the hash masks depend only on
    absolute coordinates, so fwd and bwd may tile differently). With
    ``full=False`` (the fwd kernel) the per-head softmax/mask tensors are
    not retained — only the bwd needs them."""
    d = w["wq"].shape[-1]
    Dh = d // num_heads
    row0 = i * tile
    xq_cd = x_ref[0, pl.ds(row0, tile), :].astype(cd)             # (T, d) cd
    xq = xq_cd.astype(jnp.float32)
    q = _mm(xq_cd, w["wq"]) + w["bq"]                             # f32 accum

    outs, heads, keeps = [], [], []
    for h in range(num_heads):
        sl = slice(h * Dh, (h + 1) * Dh)
        s = _mm(q[:, sl], k[:, sl], tb=True, cd=cd) * scale        # (T, N)
        s = jnp.where(key_mask, NEG_INF, s)
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=1, keepdims=True)
        # softmax normalize via reciprocal broadcast: the (T, 1) divide +
        # (T, N) multiply replaces a full-tile divide (the VPU's divide is
        # many-cycle; this path is off the MXU and on the critical ~2 ms
        # of non-MXU step time). ~1 ulp vs e / l; the fwd kernel further
        # folds the dropout keep-scale into the row factor and never
        # forms p at all.
        linv = 1.0 / l                                             # (T, 1)
        keep = _hash_keep(seed, S_ATTN * 8 + h, b, row0, e.shape, rate)
        if full:
            p = e * linv
            pd = _drop(p, keep, rate).astype(cd)
            heads.append(p)   # pd is recomputed by the bwd from p + keep
            keeps.append(keep)  # bool masks: cheap to retain, pricey to
                                # rehash (the attention site is the largest
                                # hash load in the step)
        elif rate > 0.0:
            pd = (jnp.where(keep, e, 0.0)
                  * (linv * (1.0 / (1.0 - rate)))).astype(cd)
        else:
            pd = (e * linv).astype(cd)
        outs.append(_mm(pd, v[:, sl]))
    attn = jnp.concatenate(outs, axis=1)                           # (T, d)

    proj = _mm(attn, w["wp"], cd=cd) + w["bp"]
    keep1 = _hash_keep(seed, S_RES1, b, row0, proj.shape, rate)
    z1 = _drop(proj, keep1, rate) + xq
    h1, xhat1, inv1 = _ln_fwd(z1, w["ln1s"], w["ln1b"])

    a1 = _mm(h1, w["wf1"], cd=cd) + w["bf1"]                       # (T, 4d)
    r1 = jnp.maximum(a1, 0.0)
    keepm = _hash_keep(seed, S_MLP, b, row0, r1.shape, rate)
    m1d = _drop(r1, keepm, rate).astype(cd)
    m2 = _mm(m1d, w["wf2"]) + w["bf2"]                             # (T, d)
    keep2 = _hash_keep(seed, S_RES2, b, row0, m2.shape, rate)
    z2 = _drop(m2, keep2, rate) + h1
    out, xhat2, inv2 = _ln_fwd(z2, w["ln2s"], w["ln2b"])
    # The bool keep masks ARE returned (keeps/keep1/keepm/keep2) so the bwd
    # never hashes a mask twice; m1d / per-head pd are still recomputed from
    # a1/p + the masks (one relu/where each — cheaper to rebuild than to
    # retain as f32). The old under-16MB-scoped-VMEM concern is gone: both
    # kernels now carry explicit vmem_limit_bytes and the masks are i1.
    return dict(xq=xq, xq_cd=xq_cd, q=q, heads=heads, keeps=keeps, attn=attn,
                xhat1=xhat1, inv1=inv1, h1=h1, a1=a1,
                keep1=keep1, keepm=keepm, keep2=keep2,
                xhat2=xhat2, inv2=inv2, out=out)


def _unpack_w(refs, cd):
    """2-D weights in the compute dtype (pre-cast by the wrapper); biases
    and LN vectors in f32."""
    return {name: (refs[name][...] if refs[name].ndim == 2
                   else refs[name][...].astype(jnp.float32))
            for name in PARAM_NAMES}


# matmul operand dtype for both kernels; see _mm for the measurement notes.
OPERAND_DTYPE = jnp.float32


def _fwd_kernel(x_ref, mask_ref, seed_ref, *refs, num_heads, scale, rate,
                n_tiles, tile_q):
    cd = OPERAND_DTYPE
    w_refs = dict(zip(PARAM_NAMES, refs[:16]))
    o_ref = refs[16]
    b = pl.program_id(0)
    w = _unpack_w(w_refs, cd)
    key_mask = mask_ref[0] != 0
    x_cd = x_ref[0].astype(cd)
    # K/V resident in VMEM in the compute dtype (f32-accumulated projection)
    k = (_mm(x_cd, w["wk"]) + w["bk"]).astype(cd)
    v = (_mm(x_cd, w["wv"]) + w["bv"]).astype(cd)
    seed = seed_ref[0, 0]

    def tile(i, _):
        t = _tile_forward(x_ref, w, key_mask, seed, b, i, k, v, num_heads,
                          scale, rate, cd, tile=tile_q, full=False)
        o_ref[0, pl.ds(i * tile_q, tile_q), :] = t["out"].astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_tiles, tile, 0)


def _bwd_kernel(x_ref, mask_ref, seed_ref, *refs, num_heads, scale, rate,
                n_tiles, tile_q):
    w_refs = dict(zip(PARAM_NAMES, refs[:16]))
    do_ref = refs[16]
    dx_ref = refs[17]
    g_refs = dict(zip(PARAM_NAMES, refs[18:34]))
    dx_acc, dk_acc, dv_acc = refs[34], refs[35], refs[36]

    cd = OPERAND_DTYPE
    b = pl.program_id(0)
    w = _unpack_w(w_refs, cd)
    key_mask = mask_ref[0] != 0
    x_cd = x_ref[0].astype(cd)
    k = (_mm(x_cd, w["wk"]) + w["bk"]).astype(cd)
    v = (_mm(x_cd, w["wv"]) + w["bv"]).astype(cd)
    seed = seed_ref[0, 0]
    d = k.shape[-1]
    Dh = d // num_heads
    inv_keep = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0

    # zero the param-grad accumulators once, at the first grid cell
    @pl.when(b == 0)
    def _():
        for name in PARAM_NAMES:
            g_refs[name][...] = jnp.zeros_like(g_refs[name])

    dk_acc[...] = jnp.zeros_like(dk_acc)
    dv_acc[...] = jnp.zeros_like(dv_acc)

    def tile(i, _):
        row0 = i * tile_q
        t = _tile_forward(x_ref, w, key_mask, seed, b, i, k, v, num_heads,
                          scale, rate, cd, tile=tile_q)
        do = do_ref[0, pl.ds(row0, tile_q), :].astype(jnp.float32)

        # masks come back from the forward recompute (hashed exactly once);
        # the dropped MLP activation rebuilds from a1 + keepm (one relu/where)
        keep1, keep2, keepm = t["keep1"], t["keep2"], t["keepm"]
        m1d = _drop(jnp.maximum(t["a1"], 0.0), keepm, rate)

        # LN2 backward
        dz2, dg2, db2 = _ln_bwd(do, t["xhat2"], t["inv2"], w["ln2s"])
        g_refs["ln2s"][...] += dg2
        g_refs["ln2b"][...] += db2
        dh1 = dz2                                   # residual branch
        dm2 = (jnp.where(keep2, dz2 * inv_keep, 0.0)
               if rate > 0.0 else dz2)

        # fc2 backward (grad matmuls run in cd like the XLA bf16 path's VJP;
        # accumulation and the g_refs accumulators stay f32)
        g_refs["wf2"][...] += _mm(m1d, dm2, ta=True, cd=cd)
        g_refs["bf2"][...] += dm2.sum(axis=0)
        dm1d = _mm(dm2, w["wf2"], tb=True, cd=cd)
        da1 = dm1d
        if rate > 0.0:
            da1 = jnp.where(keepm, da1 * inv_keep, 0.0)
        da1 = jnp.where(t["a1"] > 0.0, da1, 0.0)

        # fc1 backward
        g_refs["wf1"][...] += _mm(t["h1"], da1, ta=True, cd=cd)
        g_refs["bf1"][...] += da1.sum(axis=0)
        dh1 = dh1 + _mm(da1, w["wf1"], tb=True, cd=cd)

        # LN1 backward
        dz1, dg1, db1 = _ln_bwd(dh1, t["xhat1"], t["inv1"], w["ln1s"])
        g_refs["ln1s"][...] += dg1
        g_refs["ln1b"][...] += db1
        dxq = dz1                                   # residual branch
        dproj = (jnp.where(keep1, dz1 * inv_keep, 0.0)
                 if rate > 0.0 else dz1)

        # proj backward
        g_refs["wp"][...] += _mm(t["attn"], dproj, ta=True, cd=cd)
        g_refs["bp"][...] += dproj.sum(axis=0)
        dattn = _mm(dproj, w["wp"], tb=True, cd=cd)  # (T, d)

        # attention backward per head (concatenate dq parts — Mosaic has no
        # scatter lowering for .at[].set on values)
        dq_parts = []
        for h in range(num_heads):
            sl = slice(h * Dh, (h + 1) * Dh)
            p = t["heads"][h]
            keep = t["keeps"][h]
            pd = _drop(p, keep, rate).astype(cd)
            do_h = dattn[:, sl]
            dv_acc[:, sl] += _mm(pd, do_h, ta=True, cd=cd)
            dpd = _mm(do_h, v[:, sl], tb=True, cd=cd)
            dp = (jnp.where(keep, dpd * inv_keep, 0.0)
                  if rate > 0.0 else dpd)
            ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))
            dq_parts.append(_mm(ds, k[:, sl], cd=cd) * scale)
            dk_acc[:, sl] += _mm(ds, t["q"][:, sl], ta=True, cd=cd) * scale
        dq = jnp.concatenate(dq_parts, axis=1)

        # q projection backward
        g_refs["wq"][...] += _mm(t["xq_cd"], dq, ta=True, cd=cd)
        g_refs["bq"][...] += dq.sum(axis=0)
        dxq = dxq + _mm(dq, w["wq"], tb=True, cd=cd)

        dx_acc[pl.ds(row0, tile_q), :] = dxq
        return 0

    jax.lax.fori_loop(0, n_tiles, tile, 0)

    # K/V projections: contributions through the whole sequence
    g_refs["wk"][...] += _mm(x_cd, dk_acc[...], ta=True, cd=cd)
    g_refs["bk"][...] += dk_acc[...].sum(axis=0)
    g_refs["wv"][...] += _mm(x_cd, dv_acc[...], ta=True, cd=cd)
    g_refs["bv"][...] += dv_acc[...].sum(axis=0)
    dx = (dx_acc[...] + _mm(dk_acc[...], w["wk"], tb=True, cd=cd)
          + _mm(dv_acc[...], w["wv"], tb=True, cd=cd))
    dx_ref[0] = dx.astype(dx_ref.dtype)


# ---------------------------------------------------------------------------
# Grouped kernels for short sequences: one grid cell processes ``group``
# batch elements (same idea as ops/block_kernel._block_kernel_grouped). All
# row-wise ops batch over the G·N rows; attention and the dropout-mask
# generation stay per element so the hash coordinates (site, absolute batch,
# sequence row, col) — and therefore the mask bits — are identical to the
# per-element kernels and the dense reference.
# ---------------------------------------------------------------------------

def _group_keep(seed, site, b0, G, N, cols, rate):
    """Row-batched keep mask (G·N, cols) built from per-element slabs."""
    return jnp.concatenate(
        [_hash_keep(seed, site, b0 * G + g, 0, (N, cols), rate)
         for g in range(G)], axis=0)


def _group_forward(x_ref, w, mask_ref, seed, b0, G, num_heads, scale, rate,
                   cd, full=True):
    """Forward for one grid cell of G elements; returns row-batched (G·N, ·)
    intermediates plus (with ``full=True``) the per-(g, h) softmax list."""
    N, d = x_ref.shape[1], x_ref.shape[2]
    Dh = d // num_heads
    xf_cd = x_ref[...].reshape(G * N, d).astype(cd)
    xf = xf_cd.astype(jnp.float32)
    q = _mm(xf_cd, w["wq"]) + w["bq"]
    k = (_mm(xf_cd, w["wk"]) + w["bk"]).astype(cd)
    v = (_mm(xf_cd, w["wv"]) + w["bv"]).astype(cd)

    groups, heads, keeps = [], [], []
    for g in range(G):
        key_mask = mask_ref[g] != 0                       # (1, N)
        rows = slice(g * N, (g + 1) * N)
        outs = []
        for h in range(num_heads):
            sl = slice(h * Dh, (h + 1) * Dh)
            s = _mm(q[rows, sl], k[rows, sl], tb=True, cd=cd) * scale
            s = jnp.where(key_mask, NEG_INF, s)
            m = jnp.max(s, axis=1, keepdims=True)
            e = jnp.exp(s - m)
            # reciprocal-broadcast normalize (see _tile_forward)
            linv = 1.0 / jnp.sum(e, axis=1, keepdims=True)
            keep = _hash_keep(seed, S_ATTN * 8 + h, b0 * G + g, 0, e.shape,
                              rate)
            if full:
                p = e * linv
                pd = _drop(p, keep, rate).astype(cd)
                heads.append(p)                           # index g*H + h
                keeps.append(keep)
            elif rate > 0.0:
                pd = (jnp.where(keep, e, 0.0)
                      * (linv * (1.0 / (1.0 - rate)))).astype(cd)
            else:
                pd = (e * linv).astype(cd)
            outs.append(_mm(pd, v[rows, sl]))
        groups.append(jnp.concatenate(outs, axis=1))
    attn = jnp.concatenate(groups, axis=0)                # (GN, d) f32

    proj = _mm(attn, w["wp"], cd=cd) + w["bp"]
    keep1 = _group_keep(seed, S_RES1, b0, G, N, d, rate)
    z1 = _drop(proj, keep1, rate) + xf
    h1, xhat1, inv1 = _ln_fwd(z1, w["ln1s"], w["ln1b"])
    a1 = _mm(h1, w["wf1"], cd=cd) + w["bf1"]              # (GN, 4d)
    r1 = jnp.maximum(a1, 0.0)
    keepm = _group_keep(seed, S_MLP, b0, G, N, a1.shape[-1], rate)
    m1d = _drop(r1, keepm, rate).astype(cd)
    m2 = _mm(m1d, w["wf2"]) + w["bf2"]
    keep2 = _group_keep(seed, S_RES2, b0, G, N, d, rate)
    z2 = _drop(m2, keep2, rate) + h1
    out, xhat2, inv2 = _ln_fwd(z2, w["ln2s"], w["ln2b"])
    return dict(xf=xf, xf_cd=xf_cd, q=q, k=k, v=v, heads=heads, keeps=keeps,
                attn=attn, xhat1=xhat1, inv1=inv1, h1=h1, a1=a1,
                keep1=keep1, keepm=keepm, keep2=keep2,
                xhat2=xhat2, inv2=inv2, out=out)


def _fwd_kernel_grouped(x_ref, mask_ref, seed_ref, *refs, num_heads, scale,
                        rate, group):
    cd = OPERAND_DTYPE
    w = _unpack_w(dict(zip(PARAM_NAMES, refs[:16])), cd)
    o_ref = refs[16]
    G, N, d = x_ref.shape
    t = _group_forward(x_ref, w, mask_ref, seed_ref[0, 0], pl.program_id(0),
                       group, num_heads, scale, rate, cd, full=False)
    o_ref[...] = t["out"].reshape(G, N, d).astype(o_ref.dtype)


def _bwd_kernel_grouped(x_ref, mask_ref, seed_ref, *refs, num_heads, scale,
                        rate, group):
    w_refs = dict(zip(PARAM_NAMES, refs[:16]))
    do_ref = refs[16]
    dx_ref = refs[17]
    g_refs = dict(zip(PARAM_NAMES, refs[18:34]))

    cd = OPERAND_DTYPE
    G, N, d = x_ref.shape
    Dh = d // num_heads
    b_cell = pl.program_id(0)
    w = _unpack_w(w_refs, cd)
    seed = seed_ref[0, 0]
    inv_keep = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0

    @pl.when(b_cell == 0)
    def _():
        for name in PARAM_NAMES:
            g_refs[name][...] = jnp.zeros_like(g_refs[name])

    t = _group_forward(x_ref, w, mask_ref, seed, b_cell, G, num_heads,
                       scale, rate, cd)
    do = do_ref[...].reshape(G * N, d).astype(jnp.float32)

    # masks come back from the forward recompute (hashed exactly once)
    keep1, keep2, keepm = t["keep1"], t["keep2"], t["keepm"]
    m1d = _drop(jnp.maximum(t["a1"], 0.0), keepm, rate)

    dz2, dg2, db2 = _ln_bwd(do, t["xhat2"], t["inv2"], w["ln2s"])
    g_refs["ln2s"][...] += dg2
    g_refs["ln2b"][...] += db2
    dh1 = dz2
    dm2 = jnp.where(keep2, dz2 * inv_keep, 0.0) if rate > 0.0 else dz2

    g_refs["wf2"][...] += _mm(m1d, dm2, ta=True, cd=cd)
    g_refs["bf2"][...] += dm2.sum(axis=0)
    da1 = _mm(dm2, w["wf2"], tb=True, cd=cd)
    if rate > 0.0:
        da1 = jnp.where(keepm, da1 * inv_keep, 0.0)
    da1 = jnp.where(t["a1"] > 0.0, da1, 0.0)

    g_refs["wf1"][...] += _mm(t["h1"], da1, ta=True, cd=cd)
    g_refs["bf1"][...] += da1.sum(axis=0)
    dh1 = dh1 + _mm(da1, w["wf1"], tb=True, cd=cd)

    dz1, dg1, db1 = _ln_bwd(dh1, t["xhat1"], t["inv1"], w["ln1s"])
    g_refs["ln1s"][...] += dg1
    g_refs["ln1b"][...] += db1
    dxf = dz1
    dproj = jnp.where(keep1, dz1 * inv_keep, 0.0) if rate > 0.0 else dz1

    g_refs["wp"][...] += _mm(t["attn"], dproj, ta=True, cd=cd)
    g_refs["bp"][...] += dproj.sum(axis=0)
    dattn = _mm(dproj, w["wp"], tb=True, cd=cd)           # (GN, d)

    dq_groups, dk_groups, dv_groups = [], [], []
    for g in range(G):
        rows = slice(g * N, (g + 1) * N)
        dq_parts, dk_parts, dv_parts = [], [], []
        for h in range(num_heads):
            sl = slice(h * Dh, (h + 1) * Dh)
            p = t["heads"][g * num_heads + h]
            keep = t["keeps"][g * num_heads + h]
            pd = _drop(p, keep, rate).astype(cd)
            do_h = dattn[rows, sl]
            dv_parts.append(_mm(pd, do_h, ta=True, cd=cd))
            dpd = _mm(do_h, t["v"][rows, sl], tb=True, cd=cd)
            dp = (jnp.where(keep, dpd * inv_keep, 0.0)
                  if rate > 0.0 else dpd)
            ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))
            dq_parts.append(_mm(ds, t["k"][rows, sl], cd=cd) * scale)
            dk_parts.append(_mm(ds, t["q"][rows, sl], ta=True, cd=cd) * scale)
        dq_groups.append(jnp.concatenate(dq_parts, axis=1))
        dk_groups.append(jnp.concatenate(dk_parts, axis=1))
        dv_groups.append(jnp.concatenate(dv_parts, axis=1))
    dq = jnp.concatenate(dq_groups, axis=0)               # (GN, d)
    dk = jnp.concatenate(dk_groups, axis=0)
    dv = jnp.concatenate(dv_groups, axis=0)

    g_refs["wq"][...] += _mm(t["xf_cd"], dq, ta=True, cd=cd)
    g_refs["bq"][...] += dq.sum(axis=0)
    g_refs["wk"][...] += _mm(t["xf_cd"], dk, ta=True, cd=cd)
    g_refs["bk"][...] += dk.sum(axis=0)
    g_refs["wv"][...] += _mm(t["xf_cd"], dv, ta=True, cd=cd)
    g_refs["bv"][...] += dv.sum(axis=0)

    dx = (dxf + _mm(dq, w["wq"], tb=True, cd=cd)
          + _mm(dk, w["wk"], tb=True, cd=cd)
          + _mm(dv, w["wv"], tb=True, cd=cd))
    dx_ref[...] = dx.reshape(G, N, d).astype(dx_ref.dtype)


def _pick_train_group(B: int, N: int) -> int:
    """Group policy for the train kernels: shared with the inference
    kernels (ops/block_kernel._pick_group) so the VMEM-guard group choice
    and the kernels' group choice can never desynchronize. The bwd
    additionally retains G·H (N, N) f32 softmax tensors, which stays under
    5 MB at the shared caps (N < 512 ⇒ G·N ≤ 1024)."""
    return _pick_group(B, N)


def _cast_w(flat_w, cd):
    """2-D weights → compute dtype (VMEM blocks shrink with bf16); biases
    and LN vectors stay f32."""
    return tuple(w.astype(cd) if w.ndim == 2 else w.astype(jnp.float32)
                 for w in flat_w)


def _flatten_params(block: Dict[str, Any]):
    a, m = block["attn"], block["mlp"]
    return (a["q"]["w"], a["q"]["b"], a["k"]["w"], a["k"]["b"],
            a["v"]["w"], a["v"]["b"], a["proj"]["w"], a["proj"]["b"],
            block["ln1"]["scale"], block["ln1"]["bias"],
            m["fc1"]["w"], m["fc1"]["b"], m["fc2"]["w"], m["fc2"]["b"],
            block["ln2"]["scale"], block["ln2"]["bias"])


def _unflatten_grads(flat):
    g = dict(zip(PARAM_NAMES, flat))
    return {
        "attn": {"q": {"w": g["wq"], "b": g["bq"]},
                 "k": {"w": g["wk"], "b": g["bk"]},
                 "v": {"w": g["wv"], "b": g["bv"]},
                 "proj": {"w": g["wp"], "b": g["bp"]}},
        "mlp": {"fc1": {"w": g["wf1"], "b": g["bf1"]},
                "fc2": {"w": g["wf2"], "b": g["bf2"]}},
        "ln1": {"scale": g["ln1s"], "bias": g["ln1b"]},
        "ln2": {"scale": g["ln2s"], "bias": g["ln2b"]},
    }


def _interpret():
    if jax.default_backend() == "tpu":
        return False
    return pltpu.InterpretParams()


def _w_specs(flat):
    specs = []
    for wv_ in flat:
        if wv_.ndim == 2:
            specs.append(pl.BlockSpec(wv_.shape, lambda b: (0, 0),
                                      memory_space=pltpu.VMEM))
        else:
            specs.append(pl.BlockSpec(wv_.shape, lambda b: (0,),
                                      memory_space=pltpu.VMEM))
    return specs


def _pick_fwd_tile(N: int) -> int:
    """Largest dividing query tile for the fwd kernel (same policy as the
    inference kernel, ops/block_kernel._pick_tile: bigger tiles amortize
    K/V reuse; the fwd keeps no per-head tensors so VMEM allows it)."""
    cap = 512 if N <= 1024 else (256 if N <= 2048 else 128)
    for tile in (cap, 256, 128):
        if tile <= cap and N % tile == 0:
            return tile
    return TILE


def _pick_bwd_tile(N: int) -> int:
    """Query tile for the bwd kernel (same caps as the fwd: the bwd retains
    the per-head softmax (tile, N) f32 × heads per tile, but the raised
    scoped-VMEM budget covers it at these caps). Measured at flagship shape
    B=32/N=512/d=256: 6.51 / 5.63 / 5.40 ms/step at tiles 128 / 256 / 512 —
    the full train step drops 22% vs the old fixed 128."""
    cap = 512 if N <= 1024 else (256 if N <= 2048 else 128)
    for tile in (cap, 256, 128):
        if tile <= cap and N % tile == 0:
            return tile
    return TILE


@functools.partial(jax.jit, static_argnames=("num_heads", "scale", "rate",
                                             "interpret"))
def _forward(x, mask, seed, flat_w, num_heads, scale, rate, interpret):
    B, N, d = x.shape
    group = _pick_train_group(B, N)
    if group > 1:
        kernel = functools.partial(_fwd_kernel_grouped, num_heads=num_heads,
                                   scale=scale, rate=rate, group=group)
        io_spec = pl.BlockSpec((group, N, d), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)
        mask_spec = pl.BlockSpec((group, 1, N), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
        grid = (B // group,)
    else:
        tile_q = _pick_fwd_tile(N)
        kernel = functools.partial(_fwd_kernel, num_heads=num_heads,
                                   scale=scale, rate=rate,
                                   n_tiles=N // tile_q, tile_q=tile_q)
        io_spec = pl.BlockSpec((1, N, d), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)
        mask_spec = pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
        grid = (B,)
    return pl.pallas_call(
        kernel, grid=grid,
        in_specs=[
            io_spec,
            mask_spec,
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
            *_w_specs(flat_w),
        ],
        out_specs=io_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, mask, seed, *flat_w)


@functools.partial(jax.jit, static_argnames=("num_heads", "scale", "rate",
                                             "interpret"))
def _backward(x, mask, seed, flat_w, do, num_heads, scale, rate, interpret):
    B, N, d = x.shape
    # param-grad outputs revisit one block across the sequential grid
    grad_specs = []
    grad_shapes = []
    for wv_ in flat_w:
        if wv_.ndim == 2:
            grad_specs.append(pl.BlockSpec(wv_.shape, lambda b: (0, 0),
                                           memory_space=pltpu.VMEM))
        else:
            grad_specs.append(pl.BlockSpec(wv_.shape, lambda b: (0,),
                                           memory_space=pltpu.VMEM))
        grad_shapes.append(jax.ShapeDtypeStruct(wv_.shape, jnp.float32))
    group = _pick_train_group(B, N)
    if group > 1:
        kernel = functools.partial(_bwd_kernel_grouped, num_heads=num_heads,
                                   scale=scale, rate=rate, group=group)
        io_spec = pl.BlockSpec((group, N, d), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)
        mask_spec = pl.BlockSpec((group, 1, N), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
        grid = (B // group,)
        scratch = []
    else:
        tile_q = _pick_bwd_tile(N)
        kernel = functools.partial(_bwd_kernel, num_heads=num_heads,
                                   scale=scale, rate=rate,
                                   n_tiles=N // tile_q, tile_q=tile_q)
        io_spec = pl.BlockSpec((1, N, d), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)
        mask_spec = pl.BlockSpec((1, 1, N), lambda b: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
        grid = (B,)
        scratch = [pltpu.VMEM((N, d), jnp.float32),
                   pltpu.VMEM((N, d), jnp.float32),
                   pltpu.VMEM((N, d), jnp.float32)]
    out = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[
            io_spec,
            mask_spec,
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
            *_w_specs(flat_w),
            io_spec,
        ],
        out_specs=(io_spec, *grad_specs),
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype), *grad_shapes),
        scratch_shapes=scratch,
        # the bwd working set (weights + grads + per-head softmax tiles)
        # legitimately exceeds Mosaic's conservative 16 MB default scoped-
        # VMEM cap at flagship shapes; v5e has 128 MB VMEM per core
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(x, mask, seed, *flat_w, do)
    return out[0], out[1:]


def fused_block_train_supported(B: int, N: int, d: int,
                                num_heads: int) -> bool:
    """True when the TRAIN kernels' backward working set fits the 96 MB
    scoped-VMEM cap, modelling the branch :func:`_backward` actually
    dispatches (mirrors ops/block_kernel._working_set_bytes).

    Per-element branch (N >= 512) dominant terms per grid cell: x/K/V/do +
    dk/dv/dx accumulators (8 × (N, d) f32), the per-head retained softmax +
    keep masks (H × (tile, N), f32 + i8), the (tile, 4d) MLP tiles, and the
    f32 weight+grad blocks (2 × 9d²). Grouped branch (N < 512, G =
    ``_pick_train_group(B, N)`` batches per cell): the same (rows, d) and
    (rows, 4d) terms at rows = G·N, plus the G·H retained (N, N) softmax +
    keep tensors — bounded by construction (G·N <= 1024, ~25 MB worst
    case), so no real shape demotes through this branch today; it exists so
    the guard and the kernel can never desynchronize if the group policy
    widens. Measured edges on v5e (d=256, H=4): N=5120 runs (~60 MB
    estimate), N=10240 fails (~110 MB) — callers demote to
    attn_impl='pallas' (flash kernels, XLA block) past this."""
    if N % 128 != 0:
        return False
    g = _pick_train_group(B, N)
    if g > 1:
        rows = g * N
        est = (8 * rows * d * 4
               + num_heads * g * N * N * 5
               + 2 * rows * 4 * d * 4
               + 2 * 9 * d * d * 4)
    else:
        tile = _pick_bwd_tile(N)
        est = (8 * N * d * 4
               + num_heads * tile * N * 5
               + 2 * tile * 4 * d * 4
               + 2 * 9 * d * d * 4)
    return est <= 88 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_block_train(x, block_params, mask, seed, num_heads: int,
                      scale: float, rate: float):
    """Trainable fused encoder block.

    x (B, N, d); block_params = a SimNet block dict; mask (B, 1, N) int8;
    seed (1, 1) int32; N must be a multiple of 128.
    """
    assert num_heads <= MAX_HASH_HEADS, (
        f"dropout site encoding supports <= {MAX_HASH_HEADS} heads")
    flat_w = _cast_w(_flatten_params(block_params), OPERAND_DTYPE)
    return _forward(x, mask, seed, flat_w, num_heads, scale, rate,
                    _interpret())


def _vjp_fwd(x, block_params, mask, seed, num_heads, scale, rate):
    out = fused_block_train(x, block_params, mask, seed, num_heads, scale,
                            rate)
    return out, (x, block_params, mask, seed)


def _vjp_bwd(num_heads, scale, rate, residuals, do):
    x, block_params, mask, seed = residuals
    flat_w = _cast_w(_flatten_params(block_params), OPERAND_DTYPE)
    dx, flat_grads = _backward(x, mask, seed, flat_w, do.astype(x.dtype),
                               num_heads, scale, rate, _interpret())
    return dx, _unflatten_grads(flat_grads), None, None


fused_block_train.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# Host-replicable reference (for tests): the same block in dense XLA with the
# identical hash masks.
# ---------------------------------------------------------------------------

def _ref_keep(seed, site, b, N, cols, rate):
    tiles = N // TILE
    rows = []
    for i in range(tiles):
        rows.append(_hash_keep(jnp.asarray(seed, jnp.int32), site, b,
                               i * TILE, (TILE, cols), rate))
    return jnp.concatenate(rows, axis=0)


def block_reference_with_masks(x, block_params, bool_mask, seed, num_heads,
                               scale, rate):
    """Dense jnp implementation applying the identical hash masks. Mirrors
    the kernel's dtype contract: matmul operands in x.dtype with f32
    accumulation; softmax/LN/dropout math in f32."""
    B, N, d = x.shape
    Dh = d // num_heads
    cd = jnp.float32  # mirrors the kernels' pinned f32 operand policy
    a, m = block_params["attn"], block_params["mlp"]

    def mm(lhs, rhs, tb=False):
        return _mm(lhs, rhs, tb=tb, cd=cd)

    outs = []
    for b in range(B):
        xb = x[b]
        xb_f32 = xb.astype(jnp.float32)
        q = mm(xb, a["q"]["w"]) + a["q"]["b"].astype(jnp.float32)
        k = (mm(xb, a["k"]["w"]) + a["k"]["b"].astype(jnp.float32)).astype(cd)
        v = (mm(xb, a["v"]["w"]) + a["v"]["b"].astype(jnp.float32)).astype(cd)
        heads = []
        for h in range(num_heads):
            sl = slice(h * Dh, (h + 1) * Dh)
            s = mm(q[:, sl], k[:, sl], tb=True) * scale
            s = jnp.where(bool_mask[b][None, :], NEG_INF, s)
            p = jax.nn.softmax(s, axis=-1)
            keep = _ref_keep(seed, S_ATTN * 8 + h, b, N, N, rate)
            pd = _drop(p, keep, rate).astype(cd)
            heads.append(mm(pd, v[:, sl]))
        attn = jnp.concatenate(heads, axis=1)
        proj = mm(attn, a["proj"]["w"]) + a["proj"]["b"].astype(jnp.float32)
        z1 = (_drop(proj, _ref_keep(seed, S_RES1, b, N, d, rate), rate)
              + xb_f32)
        h1, _, _ = _ln_fwd(z1, block_params["ln1"]["scale"],
                           block_params["ln1"]["bias"])
        a1 = mm(h1, m["fc1"]["w"]) + m["fc1"]["b"].astype(jnp.float32)
        r1 = jnp.maximum(a1, 0.0)
        m1d = _drop(r1, _ref_keep(seed, S_MLP, b, N, a1.shape[1], rate),
                    rate).astype(cd)
        m2 = mm(m1d, m["fc2"]["w"]) + m["fc2"]["b"].astype(jnp.float32)
        z2 = _drop(m2, _ref_keep(seed, S_RES2, b, N, d, rate), rate) + h1
        out, _, _ = _ln_fwd(z2, block_params["ln2"]["scale"],
                            block_params["ln2"]["bias"])
        outs.append(out)
    return jnp.stack(outs).astype(x.dtype)
