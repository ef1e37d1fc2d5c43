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
from jax.sharding import Mesh, PartitionSpec as P


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   pad_mask: Optional[jnp.ndarray], scale: float,
                   axis_name: str) -> jnp.ndarray:
    """Exact attention with q/k/v sharded over ``axis_name``.

    Shapes are per-shard: q/k/v (B, H, Nl, Dh), pad_mask (B, Nl) True=padded.
    Must run inside ``shard_map``/collective context where ``axis_name`` is
    bound. Returns the local (B, H, Nl, Dh) output block.
    """
    n_shards = jax.lax.axis_size(axis_name)
    B, H, Nl, Dh = q.shape
    if pad_mask is None:
        pad_mask = jnp.zeros((B, Nl), bool)

    q32 = q.astype(jnp.float32) * scale
    neg_inf = jnp.float32(-jnp.inf)

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

    out = jnp.where(l[..., None] == 0.0, 0.0, o / l[..., None])
    return out.astype(q.dtype)


def make_ring_forward(mesh: Mesh, scale: float, seq_axis: str = "seq"):
    """A jitted sequence-sharded attention forward for a (data, seq) mesh:
    q/k/v (B, H, N, Dh) and pad_mask (B, N) arrive whole; batch shards over
    ``data``, sequence over ``seq``."""
    qkv_spec = P("data", None, seq_axis, None)
    mask_spec = P("data", seq_axis)

    @jax.jit
    def fwd(q, k, v, pad_mask):
        shard = jax.shard_map(
            functools.partial(ring_attention, scale=scale,
                              axis_name=seq_axis),
            mesh=mesh,
            in_specs=(qkv_spec, qkv_spec, qkv_spec, mask_spec),
            out_specs=qkv_spec)
        return shard(q, k, v, pad_mask)

    return fwd
