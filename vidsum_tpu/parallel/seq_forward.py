"""Sequence-parallel scorer forward: the full SimNet over a (data, seq) mesh.

For the raw-video stretch config (frame counts far beyond the 2.5k-frame
dense envelope), the sequence axis itself is sharded: every position-wise op
(embedding, LN, MLP, head) runs locally on each shard, positional encodings
are indexed at each shard's global offset, and attention runs as exact
ring attention (``parallel/ring_attention.py``) with K/V rotating over ICI.
Activations per device scale as O(N/P) and no N×N tensor ever exists.

No reference analogue — the reference's PE table caps sequences at 2000
frames on a single GPU (``src/model/simnet.py:188,224``).
"""

from __future__ import annotations

import functools
import jax
from jax.sharding import Mesh, PartitionSpec as P

from vidsum_tpu.config import ModelConfig
from vidsum_tpu.models.simnet import simnet_apply
from vidsum_tpu.parallel.ring_attention import ring_attention


def make_seq_sharded_forward(cfg: ModelConfig, mesh: Mesh,
                             seq_axis: str = "seq",
                             data_axis: str = "data"):
    """Jitted ``fwd(params, x, pad_mask) -> (scores, hidden)`` with ``x``
    (B, N, D) sharded over (data, seq). Deterministic (inference) path;
    requires ``use_cls=False`` (the flagship config)."""
    if cfg.use_cls:
        raise ValueError("sequence-parallel forward does not support CLS "
                         "tokens (per-shard prepend would corrupt the ring)")

    n_seq = mesh.shape[seq_axis]

    def local_forward(params, x, pad_mask):
        # x: (B, Nl, D) local shard; global offset from the mesh coordinate
        shard_idx = jax.lax.axis_index(seq_axis)
        offset = shard_idx * x.shape[1]
        attn = functools.partial(ring_attention, scale=cfg.attn_scale,
                                 axis_name=seq_axis)
        # PE table must cover the GLOBAL sequence, not the local shard
        return simnet_apply(params, cfg, x, pad_mask, deterministic=True,
                            attn_fn=attn, pos_offset=offset,
                            pe_len=n_seq * x.shape[1])

    @jax.jit
    def fwd(params, x, pad_mask):
        return jax.shard_map(
            local_forward,
            mesh=mesh,
            in_specs=(P(), P(data_axis, seq_axis, None),
                      P(data_axis, seq_axis)),
            out_specs=(P(data_axis, seq_axis, None),
                       P(data_axis, seq_axis, None)),
        )(params, x, pad_mask)


    return fwd
