"""Multi-chip serving: replica-parallel short batches + seq-parallel longs.

Passing a ``mesh`` to :class:`~vidsum_tpu.serve.ScoringService` turns on
two multi-device modes behind the same ``submit()``:

- **replica-parallel short requests**: the batch dimension is sharded over
  every mesh device (``shard_map`` over a flat ``data`` axis running the
  identical local scorer — the fused kernels keep working because the
  program, not the graph, is partitioned, same rationale as
  ``parallel/dp_shardmap.py``). Submit-time rows are committed round-robin
  across the devices, so the batch is assembled from device-resident shards
  (``jax.make_array_from_single_device_arrays``) and the batch-dim pad
  still costs zero wire bytes;
- **long requests** (past the single-chip kernel envelope or an explicit
  ``long_threshold``): routed to the exact sequence-parallel ring forward
  (``parallel/seq_forward.py``) over all mesh devices — activations scale
  O(N/P) per device and no N×N tensor ever exists, so videos no single
  chip can score stay servable. The row ships seq-sharded at submit time,
  always on the lossless wire (the ring is the correctness-critical path;
  the int8 wire stays a short-request optimization).

This module owns the mesh *placement* logic: the shard_map forwards, the
long-route construction, and the balanced-shard batch assembly. Wire byte
handling lives in ``serve/transport.py``."""

from __future__ import annotations

import dataclasses
import warnings
from typing import Optional

import numpy as np

from vidsum_tpu.config import ModelConfig


def _make_replica_forward(cfg: ModelConfig, rep_mesh, attn_impl: str):
    """Batch-sharded eval forward over a flat ``data`` mesh axis: every
    device runs the identical local scorer on its batch shard (shard_map,
    not GSPMD, so the fused Pallas kernels keep working on-mesh — the same
    rationale as ``parallel/dp_shardmap.py``). Per-row arithmetic is the
    single-device program's, so scores stay batch-composition-invariant."""
    import jax
    from jax.sharding import PartitionSpec as P

    from vidsum_tpu.models.simnet import simnet_apply

    def local_fwd(params, x, pad_mask):
        scores, _ = simnet_apply(params, cfg, x, pad_mask,
                                 deterministic=True, attn_impl=attn_impl)
        return jax.nn.sigmoid(scores[..., 0])

    @jax.jit
    def fwd(params, x, pad_mask):
        return jax.shard_map(
            local_fwd, mesh=rep_mesh,
            in_specs=(P(), P("data", None, None), P("data", None)),
            out_specs=P("data", None),
            check_vma=False,  # pallas outputs carry no vma type
        )(params, x, pad_mask)

    return fwd


def make_replica_forward_int8(cfg: ModelConfig, rep_fwd):
    """Int8-wire variant of the replica forward: takes the batch-sharded
    int8 rows + per-frame f32 scales and dequantizes PER REPLICA before the
    shard_map scorer. The dequant is elementwise on data-sharded arrays, so
    GSPMD keeps it local to each replica's shard — the wire ships 4× fewer
    bytes than f32 and no dequantized row ever crosses a device boundary."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def fwd(params, x_i8, scales, pad_mask):
        x = x_i8.astype(jnp.float32) * scales[..., None]
        return rep_fwd(params, x, pad_mask)

    return fwd


def _single_chip_max_len(cfg: ModelConfig, bucket: int) -> int:
    """Largest bucketed length the single-chip kernel ladder carries —
    the default mesh-mode routing threshold (requests past it take the
    sequence-parallel ring)."""
    import jax.numpy as jnp

    from vidsum_tpu.ops.attention import flash_forward_supported

    dh = cfg.d_model // cfg.num_heads
    itemsize = jnp.dtype(cfg.compute_dtype).itemsize
    n = bucket
    while n < (1 << 21) and flash_forward_supported(n + bucket, dh,
                                                    itemsize):
        n += bucket
    return n


@dataclasses.dataclass
class MeshRouting:
    """Resolved multi-chip serving state (None fields = route disabled)."""

    devices: list
    rep_fwd: object
    rep_sharding: object          # batch-sharded (B, N, D) rows
    scale_sharding: object        # batch-sharded (B, N) int8-wire scales
    long_fwd: Optional[object]
    long_sharding: Optional[object]
    long_threshold: Optional[int]


def build_mesh_routing(cfg: ModelConfig, mesh, attn_impl: str, bucket: int,
                       long_threshold: Optional[int]
                       ) -> Optional[MeshRouting]:
    """Build the replica + ring routes over ``mesh``'s device set (axis
    names are ignored; the flattened device set is what matters). Returns
    ``None`` when the mesh is absent or single-device."""
    import jax

    if mesh is None or int(np.prod(mesh.devices.shape)) <= 1:
        return None
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = list(np.asarray(mesh.devices).reshape(-1))
    rep_mesh = Mesh(np.asarray(devs), ("data",))
    rep_fwd = _make_replica_forward(cfg, rep_mesh, attn_impl)
    rep_sharding = NamedSharding(rep_mesh, P("data", None, None))
    scale_sharding = NamedSharding(rep_mesh, P("data", None))
    long_fwd = long_sharding = None
    if cfg.use_cls:
        # the ring cannot prepend per-shard CLS tokens, so the
        # sequence-parallel long route does not exist; requests past
        # the single-chip envelope are rejected at submit() instead
        # of opaquely failing a whole replica batch (ADVICE r3).
        if long_threshold is not None:
            raise ValueError(
                "long_threshold was given but cfg.use_cls=True "
                "disables the sequence-parallel long route (the "
                "ring cannot prepend per-shard CLS tokens); drop "
                "long_threshold or serve a use_cls=False config")
        warnings.warn(
            "mesh serving with cfg.use_cls=True has no sequence-"
            "parallel long route; requests past the single-chip "
            "kernel envelope will be rejected at submit()",
            stacklevel=3)
        long_threshold = None
    else:
        from vidsum_tpu.parallel.seq_forward import make_seq_sharded_forward

        long_mesh = Mesh(np.asarray(devs).reshape(1, -1), ("data", "seq"))
        seq_fwd = make_seq_sharded_forward(cfg, long_mesh)

        @jax.jit
        def long_fwd(params, x, pad_mask):
            scores, _ = seq_fwd(params, x, pad_mask)
            return jax.nn.sigmoid(scores[..., 0])

        long_sharding = NamedSharding(long_mesh, P("data", "seq", None))
        if long_threshold is None:
            long_threshold = _single_chip_max_len(cfg, bucket)
        long_threshold = int(long_threshold)
    return MeshRouting(devices=devs, rep_fwd=rep_fwd,
                       rep_sharding=rep_sharding,
                       scale_sharding=scale_sharding, long_fwd=long_fwd,
                       long_sharding=long_sharding,
                       long_threshold=long_threshold)


def build_long_row(feats: np.ndarray, n_bucket: int, in_features: int,
                   pad_value: float, wire_dtype: np.dtype, long_sharding):
    """Pad a long request to ``bucket × n_devices`` granularity and ship it
    seq-sharded at submit time (the ring needs equal shards)."""
    import jax

    n = feats.shape[0]
    row = np.full((1, n_bucket, in_features), pad_value, dtype=wire_dtype)
    row[0, :n] = feats.astype(wire_dtype)
    return jax.device_put(row, long_sharding)


def assemble_replica_batch(items: list, devs: list, k: int, n_bucket: int,
                           in_features: int, rep_sharding,
                           int8: bool = False):
    """Form a balanced batch-sharded global array from device-resident rows.

    ``k`` rows per replica (caller picks the power-of-two). Rows landed
    round-robin at submit, so a batch drawn from consecutive submits is
    near-balanced; stragglers are re-committed replica-to-replica (ICI,
    never back over the host wire). Mutates straggler ``_Request``s'
    ``row_dev``/``dev_idx`` to their new home.

    Returns ``(x, mask, real_slots, moved)`` where ``x`` is the global
    ``(R*k, n_bucket, D)`` array (on the int8 wire: an ``(x_i8, scales)``
    pair, both batch-sharded), ``mask`` the bool pad mask, ``real_slots``
    the ``(batch_index, request)`` pairs carrying real rows, and ``moved``
    the count of ICI re-commits."""
    import jax
    import jax.numpy as jnp

    R = len(devs)
    b = R * k
    by_dev: list = [[] for _ in range(R)]
    for r in items:
        by_dev[r.dev_idx].append(r)
    moved = 0
    # rebalance: replicas holding more than k rows donate to ones
    # holding fewer
    overflow = [r for g in by_dev for r in g[k:]]
    for g in by_dev:
        del g[k:]
    for d in range(R):
        while len(by_dev[d]) < k and overflow:
            r = overflow.pop()
            r.row_dev = (tuple(jax.device_put(p, devs[d]) for p in r.row_dev)
                         if int8 else jax.device_put(r.row_dev, devs[d]))
            r.dev_idx = d
            by_dev[d].append(r)
            moved += 1
    donor = next(g[0] for g in by_dev if g)
    mask = np.ones((b, n_bucket), dtype=bool)
    rows, real_slots = [], []
    for d in range(R):
        g = by_dev[d]
        borrowed = None
        for j in range(k):
            i = d * k + j
            if j < len(g):
                r = g[j]
                rows.append(r.row_dev)
                real_slots.append((i, r))
            elif g:  # pad by repeating a row already on this replica
                r = g[j % len(g)]
                rows.append(r.row_dev)
            else:    # empty replica: borrow one row over ICI
                if borrowed is None:
                    borrowed = (tuple(jax.device_put(p, devs[d])
                                      for p in donor.row_dev) if int8
                                else jax.device_put(donor.row_dev, devs[d]))
                    moved += 1
                r = donor
                rows.append(borrowed)
            mask[i, : r.feats.shape[0]] = False

    def _global(part_idx: int, shape_tail, sharding):
        shards = [jnp.stack([rows[d * k + j][part_idx] if int8
                             else rows[d * k + j] for j in range(k)])
                  for d in range(R)]
        return jax.make_array_from_single_device_arrays(
            (b,) + shape_tail, sharding, shards)

    if int8:
        x = _global(0, (n_bucket, in_features), rep_sharding[0])
        scales = _global(1, (n_bucket,), rep_sharding[1])
        return (x, scales), mask, real_slots, moved
    x = _global(0, (n_bucket, in_features), rep_sharding)
    return x, mask, real_slots, moved
