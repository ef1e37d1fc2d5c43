"""Serving wire transports: how request bytes reach the accelerator.

The wire is a first-class resource on relay-attached hosts (it is the
serving bottleneck there — PERF.md "Serving"), so the service supports
three transports, all feeding the SAME compiled scorer programs:

- ``rows`` (default): each request's padded feature row ships host→device
  *asynchronously at submit time*, so transfers overlap earlier batches'
  compute; batches assemble on device (``jnp.stack`` of already-resident
  rows) and batch-dim padding costs zero wire bytes. Best when wire cost
  is ~bytes (a co-located DMA host).
- ``coalesced`` (single-chip only): rows stay host-side and one stacked
  array ships per micro-batch — pays batch-pad bytes but ONE fixed
  per-transfer RPC cost per batch instead of per request; best on
  high-latency relay links (~39 ms/transfer measured, PERF.md "Serving
  transport, revisited"). Scores are bit-identical to ``rows`` mode.
- ``wire_dtype="int8"`` (opt-in, LOSSY): per-frame symmetric quantization
  with an f32 per-frame scale riding along, dequantized on device — half
  the bytes of bf16 again (~2× relay req/s, PERF.md "int8 wire"). Scores
  shift by the input-quantization error (~1e-2 class); accuracy cost
  quantified in PERF.md "End-task accuracy cost". Composes with mesh
  replica mode (rows commit quantized to their replica and dequantize
  per-replica on device, ``serve/mesh.py make_replica_forward_int8``);
  ring-routed long requests stay on the lossless wire.

This module owns the *bytes*: wire validation, row construction, the
quantizer, and the single-chip batch scoring paths. Device *placement*
(which replica a row lands on, mesh assembly) lives in ``serve/mesh.py``
and the service itself."""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from vidsum_tpu.config import ModelConfig


@dataclasses.dataclass
class Wire:
    """Resolved wire policy: dtype + transport flags + compiled forwards.

    ``fwd`` is the plain eval forward ``(params, x, pad_mask) -> scores``;
    ``fwd_i8`` (int8 wire only) additionally takes the per-frame scales
    and dequantizes on device before the same scorer."""

    dtype: np.dtype
    coalesced: bool
    int8: bool
    fwd: object
    fwd_i8: Optional[object] = None


def quantize_frames(row: np.ndarray):
    """Per-frame symmetric int8 quantization of a padded f32 feature row
    block ``(n_bucket, D)`` → ``(int8 rows, f32 scales)``. The (n_bucket,)
    scales ride along on the wire (+0.4% bytes at D=1024)."""
    absmax = np.abs(row).max(axis=1)
    scale = np.where(absmax > 0.0, absmax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(row / scale[:, None]), -127, 127).astype(np.int8)
    return q, scale


def resolve_wire(cfg: ModelConfig, wire_dtype: str, wire_mode: str,
                 mesh_active: bool, fwd) -> Wire:
    """Validate the (wire_dtype, wire_mode, mesh) combination and build the
    transport policy. Raises ``ValueError`` on unsupported combinations."""
    import jax
    import jax.numpy as jnp

    if wire_mode not in ("rows", "coalesced"):
        raise ValueError(f"wire_mode must be 'rows' or 'coalesced', "
                         f"got {wire_mode!r}")
    coalesced = wire_mode == "coalesced"
    if coalesced and mesh_active:
        raise ValueError(
            "wire_mode='coalesced' is single-chip only (the mesh "
            "transports commit rows to their replica / seq shards at "
            "submit time); use wire_mode='rows'")
    int8 = wire_dtype == "int8"
    fwd_i8 = None
    if int8:
        @jax.jit
        def fwd_i8(params, x_i8, scales, pad_mask):
            x = x_i8.astype(jnp.float32) * scales[..., None]
            return fwd(params, x, pad_mask)

        dtype = np.dtype(np.int8)
    else:
        dtype = np.dtype(jnp.dtype(cfg.compute_dtype if wire_dtype == "auto"
                                   else wire_dtype))
    return Wire(dtype=dtype, coalesced=coalesced, int8=int8, fwd=fwd,
                fwd_i8=fwd_i8)


def build_short_row(wire: Wire, feats: np.ndarray, n_bucket: int,
                    in_features: int, pad_value: float):
    """Pad one request's features to its length bucket in the wire dtype.

    Returns the HOST-side payload: a single ``(n_bucket, D)`` row, or an
    ``(int8 rows, f32 scales)`` pair on the int8 wire. The caller decides
    placement (submit-time ``device_put`` vs coalesced host retention)."""
    n = feats.shape[0]
    if wire.int8:
        # quantize the padded f32 row exactly as the accuracy studies
        # replicate (scripts/study_int8_wire_accuracy.py quantize_row)
        row = np.full((n_bucket, in_features), pad_value, dtype=np.float32)
        row[:n] = feats
        return quantize_frames(row)
    row = np.full((n_bucket, in_features), pad_value, dtype=wire.dtype)
    row[:n] = feats.astype(wire.dtype)
    return row


def score_batch_single(wire: Wire, params, rows: list, mask: np.ndarray
                       ) -> np.ndarray:
    """Single-chip batch scoring: assemble the batch per transport and run
    the compiled forward. ``rows`` holds one payload per batch slot
    (repeats included); returns the ``(B, n_bucket)`` sigmoid scores."""
    import jax
    import jax.numpy as jnp

    if wire.int8:
        if wire.coalesced:          # one transfer for the whole batch
            x = jax.device_put(np.stack([r[0] for r in rows]))
            s = jax.device_put(np.stack([r[1] for r in rows]))
        else:                       # rows resident since submit()
            x = jnp.stack([r[0] for r in rows])
            s = jnp.stack([r[1] for r in rows])
        out = wire.fwd_i8(params, x, s, jnp.asarray(mask))
    else:
        x = (jax.device_put(np.stack(rows)) if wire.coalesced
             else jnp.stack(rows))
        out = wire.fwd(params, x, jnp.asarray(mask))
    return np.asarray(out, dtype=np.float32)
