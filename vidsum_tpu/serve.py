"""Online serving: micro-batched TPU scoring behind a request queue.

The reference has no serving story — scoring only exists as an offline val
pass over h5 files (``src/train.py:134-152``). Production deployment is the
opposite shape: requests arrive one at a time, at unpredictable lengths, and
the accelerator wants large *static-shape* batches. This module bridges the
two the TPU way:

- requests are padded to the same 128-multiple length buckets training uses
  (``data/collate.py``), so serving touches only a handful of compiled
  programs (first remote compile is ~10-40 s per shape; the persistent
  compile cache makes warm restarts instant);
- a dispatcher thread micro-batches concurrent requests: a bounded batching
  window (``max_delay_ms``) collects what arrived, groups it by length
  bucket, and pads each group's batch dimension to the next power of two by
  *repeating* request rows (bounded program count per bucket; repeated rows
  are discarded on output). Per-video scores are invariant to batch
  composition — each row is masked independently and no op mixes rows — so a
  batched request scores bit-identically to a solo call
  (``tests/test_serve.py``);
- the wire is treated as a first-class resource (on relay-attached hosts it
  is the serving bottleneck — PERF.md "Serving"): each request's padded
  feature row ships host→device *asynchronously at submit time*, so
  transfers overlap earlier batches' compute; batches are assembled on
  device (``jnp.stack`` of the already-resident rows), so batch-dim padding
  costs zero wire bytes; ``wire_dtype="auto"`` ships bfloat16 whenever
  the model computes in bfloat16 — bit-identical scores (``simnet_apply``
  casts inputs to ``compute_dtype`` in-model) for half the bytes; and
  ``wire_dtype="int8"`` (opt-in, LOSSY) halves them again via per-frame
  symmetric quantization dequantized on device (PERF.md "int8 wire");
- shot selection (KTS + knapsack, the bit-parity host pipeline of
  ``ops/{kts,summary,knapsack}``) runs on a worker pool, so the dispatcher
  is back on the accelerator while the CPU picks shots.

Single-host by design: one process owns its chips and the queue. Passing a
``mesh`` turns on the multi-chip modes, both behind the same ``submit()``:

- **replica-parallel short requests**: the batch dimension is sharded over
  every mesh device (``shard_map`` over a flat ``data`` axis running the
  identical local scorer — the fused kernels keep working because the
  program, not the graph, is partitioned, same rationale as
  ``parallel/dp_shardmap.py``). Submit-time rows are committed round-robin
  across the devices, so the batch is assembled from device-resident shards
  (``jax.make_array_from_single_device_arrays``) and the batch-dim pad still
  costs zero wire bytes;
- **long requests** (past the single-chip kernel envelope,
  ``ops.attention.flash_forward_supported``, or past an explicit
  ``long_threshold``): routed to the exact sequence-parallel ring forward
  (``parallel/seq_forward.py``) over all mesh devices — activations scale
  O(N/P) per device and no N×N tensor ever exists, so videos no single chip
  can score stay servable. The row ships seq-sharded at submit time.

Cross-host serving still composes externally: run one service per host
behind any load balancer (requests are independent; there is no cross-
request state).

**Admission control** (production hardening): ``submit()`` is gated by
``max_queue_depth`` — the count of admitted-but-unresolved requests. Each
admitted request pins one padded feature row in device HBM (that is the
point: the transfer overlaps earlier batches' compute), so the depth bound
is what bounds serving memory; past it ``submit()`` raises
:class:`ServiceOverloaded` *before* any device transfer starts. Requests
can carry a ``deadline_s``; ones still undispatched past their deadline
fail with :class:`DeadlineExceeded` without touching the accelerator. And
requests no compiled path can carry (past the single-chip kernel envelope
with no ring route to take) are rejected at submit time with
:class:`RequestTooLong` instead of failing a whole batch downstream.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
import warnings
from collections import defaultdict, deque
from concurrent.futures import Future, InvalidStateError, ThreadPoolExecutor
from typing import Dict, Optional, Sequence

import numpy as np

from vidsum_tpu.config import ModelConfig
from vidsum_tpu.data.collate import bucket_length
from vidsum_tpu.ops.kts import change_points_from_cps, kts_segmentation
from vidsum_tpu.ops.summary import generate_summary


class ServiceOverloaded(RuntimeError):
    """``submit()`` rejected: ``max_queue_depth`` requests are already
    admitted and unresolved. Retry after the backlog drains (HTTP 503)."""


class RequestTooLong(ValueError):
    """``submit()`` rejected: no compiled path on this service can carry a
    sequence this long (single-chip kernel envelope, and the sequence-
    parallel ring route is absent or disabled)."""


class DeadlineExceeded(TimeoutError):
    """The request's ``deadline_s`` elapsed before the dispatcher reached
    it; it was dropped without being sent to the accelerator."""


@dataclasses.dataclass
class ServeResult:
    """One request's outcome.

    ``scores`` is the sigmoid importance per input feature row (the
    reference's val-time ``Sigmoid()(output)``, train.py:144). ``summary``
    / ``change_points`` are present when shot selection ran (identical
    arithmetic to the offline eval pipeline)."""

    scores: np.ndarray                       # (n,) float32
    summary: Optional[np.ndarray]            # (n_frames,) int8 or None
    change_points: Optional[np.ndarray]      # (S, 2) inclusive bounds
    n_frames: int
    latency_s: float                         # enqueue -> result set


@dataclasses.dataclass
class ServeStats:
    requests: int             # admitted (excludes rejected)
    completed: int
    failed: int               # failed on/after the accelerator path
    rejected: int             # refused at submit() (overload / too long)
    expired: int              # deadline_s elapsed before dispatch
    batches: int
    rows_scored: int          # real request rows sent to the accelerator
    rows_padded: int          # repeated rows for power-of-two batches (they
                              # reuse device-resident arrays: zero wire cost)
    rows_moved: int           # mesh mode: rows re-committed to another
                              # replica to balance a shard (ICI, not wire)
    long_requests: int        # mesh mode: requests routed to the ring
    batch_hist: Dict[int, int]  # real-rows-per-batch -> count
    latency_mean_s: float
    latency_p50_s: float
    latency_p95_s: float
    latency_p99_s: float


@dataclasses.dataclass
class _Request:
    feats: np.ndarray
    row_dev: object            # (n_bucket, D) device array, transfer in
                               # flight (long route: (1, n_bucket, D),
                               # seq-sharded over the mesh)
    n_bucket: int
    picks: Optional[np.ndarray]
    n_frames: int
    change_points: Optional[np.ndarray]
    want_summary: bool
    budget_ratio: float
    future: Future
    t_enq: float
    deadline: Optional[float]  # absolute monotonic; None = no deadline
    dev_idx: int = -1          # mesh mode: replica the row is committed to
    long: bool = False         # mesh mode: sequence-parallel route


_CLOSE = object()


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


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


class ScoringService:
    """Micro-batching scorer: ``submit()`` from any thread, results as
    futures. One dispatcher thread owns the accelerator dispatch; a small
    pool runs host-side shot selection.

    :param max_batch: upper bound on real rows per device batch (the batch
        dim is padded up to the next power of two, so compiled programs per
        bucket number at most ``log2(max_batch)+1``).
    :param max_delay_ms: batching window — how long the dispatcher waits
        for more requests after the first one arrives. Zero still batches
        whatever is already queued.
    :param attn_impl: scorer attention impl; default picks the fused block
        kernels on TPU and XLA elsewhere (same policy as ``pipeline.py``).
    :param wire_dtype: dtype of the host→device feature transfer.
        ``"auto"`` (default) matches ``cfg.compute_dtype`` — bit-identical
        scores, since the model casts its input to that dtype anyway
        (models/simnet.py), and half the relay bytes when computing in
        bfloat16. ``"float32"`` forces full-precision wire. ``"int8"``
        (opt-in, LOSSY, single-chip only) quantizes each frame row
        symmetrically to int8 with an f32 per-frame scale dequantized
        on device — half the bytes of bf16 again, for wire-bound
        topologies where score deltas of ~1e-2 (and the rare selection
        flip they imply) are acceptable.
    :param wire_mode: ``"rows"`` (default) ships each request's padded row
        asynchronously at submit time — batch assembly on device, zero
        wire bytes for batch-dim padding; best when wire cost ~ bytes.
        ``"coalesced"`` (single-chip only) keeps rows host-side and ships
        one stacked array per micro-batch — pays batch-pad bytes but one
        fixed per-transfer RPC cost per BATCH instead of per request;
        best on high-latency relay links. Scores are bit-identical across
        modes (same compiled programs).
    :param mesh: optional ``jax.sharding.Mesh`` — serve over ALL its
        devices: short requests batch replica-parallel across them, long
        requests run the sequence-parallel ring (module docstring). Axis
        names are ignored; the device set is what matters.
    :param long_threshold: feature-row count above which a request takes
        the sequence-parallel route (mesh mode only). Default: the largest
        length the single-chip kernel ladder supports
        (``ops.attention.flash_forward_supported`` at ``cfg``'s head dim
        and compute dtype). Set lower to trade program count for long-tail
        latency (a ring pass over P chips is ~P× faster than one chip at
        the same N).
    :param max_queue_depth: admission bound — maximum admitted-but-
        unresolved requests. Each admitted request pins one padded feature
        row in device HBM (by design: the async transfer overlaps earlier
        batches' compute), so this bound is the serving memory bound. Past
        it ``submit()`` raises :class:`ServiceOverloaded` *before* any
        host-side padding or device transfer.
    :param max_request_len: optional operator cap on feature rows per
        request, checked at submit time on top of the automatic kernel-
        envelope caps (module docstring). ``None`` = envelope caps only.
    """

    def __init__(self, params, cfg: ModelConfig, *,
                 attn_impl: Optional[str] = None,
                 max_batch: int = 8, max_delay_ms: float = 3.0,
                 bucket: int = 128, pad_value: float = 1000.0,
                 budget_ratio: float = 0.15,
                 selection_workers: int = 2,
                 wire_dtype: str = "auto",
                 wire_mode: str = "rows",
                 latency_window: int = 4096,
                 max_queue_depth: int = 256,
                 max_request_len: Optional[int] = None,
                 mesh=None, long_threshold: Optional[int] = None) -> None:
        import jax
        import jax.numpy as jnp

        from vidsum_tpu.train.steps import make_eval_forward

        if attn_impl is None:
            attn_impl = ("pallas_block" if jax.default_backend() == "tpu"
                         else "xla")
        self._cfg = cfg
        self._params = params
        self._fwd = make_eval_forward(cfg, attn_impl=attn_impl)
        # --- mesh mode (replica-parallel batches + seq-parallel longs) ---
        self._mesh_devices = None
        self._rep_fwd = None
        self._rep_sharding = None
        self._long_fwd = None
        self._long_sharding = None
        self._long_threshold: Optional[int] = None
        self._rr = 0
        if mesh is not None and int(np.prod(mesh.devices.shape)) > 1:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

            devs = list(np.asarray(mesh.devices).reshape(-1))
            self._mesh_devices = devs
            rep_mesh = Mesh(np.asarray(devs), ("data",))
            self._rep_fwd = _make_replica_forward(cfg, rep_mesh, attn_impl)
            self._rep_sharding = NamedSharding(rep_mesh,
                                               P("data", None, None))
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
                    stacklevel=2)
            else:
                from vidsum_tpu.parallel.seq_forward import (
                    make_seq_sharded_forward,
                )

                long_mesh = Mesh(np.asarray(devs).reshape(1, -1),
                                 ("data", "seq"))
                seq_fwd = make_seq_sharded_forward(cfg, long_mesh)

                @jax.jit
                def _long(params, x, pad_mask):
                    scores, _ = seq_fwd(params, x, pad_mask)
                    return jax.nn.sigmoid(scores[..., 0])

                self._long_fwd = _long
                self._long_sharding = NamedSharding(
                    long_mesh, P("data", "seq", None))
                if long_threshold is None:
                    long_threshold = _single_chip_max_len(cfg, bucket)
                self._long_threshold = int(long_threshold)
        # --- wire mode: "rows" ships each request's padded row at submit
        # time (async; batch assembles on device, batch-dim padding costs
        # zero wire bytes — best when the wire cost is ~bytes, e.g. a
        # co-located DMA host). "coalesced" keeps rows host-side and ships
        # ONE stacked array per micro-batch — best when each transfer pays
        # a large fixed RPC cost (the axon relay: ~39 ms/transfer measured
        # vs 99 MB/s streaming, PERF.md "Serving transport, revisited").
        # Both modes feed the SAME compiled programs, so scores are
        # bit-identical across modes (pinned by tests).
        if wire_mode not in ("rows", "coalesced"):
            raise ValueError(f"wire_mode must be 'rows' or 'coalesced', "
                             f"got {wire_mode!r}")
        self._wire_coalesced = (wire_mode == "coalesced")
        if self._wire_coalesced and self._mesh_devices is not None:
            raise ValueError(
                "wire_mode='coalesced' is single-chip only (the mesh "
                "transports commit rows to their replica / seq shards at "
                "submit time); use wire_mode='rows'")
        # --- int8 wire (opt-in, lossy): per-frame symmetric quantization
        # halves the host->device bytes again vs bf16. On relay-attached
        # topologies serving is wire-bound (PERF.md "Serving"), so fewer
        # bytes IS the throughput lever; scores shift by the input
        # quantization error (~1e-2 class), so selections are no longer
        # bit-pinned — production default stays "auto" (lossless).
        self._wire_int8 = (wire_dtype == "int8")
        if self._wire_int8:
            if self._mesh_devices is not None:
                raise ValueError(
                    "wire_dtype='int8' is single-chip only (the replica/"
                    "ring transports ship raw rows); drop mesh= or use "
                    "wire_dtype='auto'")
            self._wire_dtype = np.dtype(np.int8)
            eval_fwd = self._fwd

            @jax.jit
            def _fwd_i8(params, x_i8, scales, pad_mask):
                x = x_i8.astype(jnp.float32) * scales[..., None]
                return eval_fwd(params, x, pad_mask)

            self._fwd_i8 = _fwd_i8
        else:
            self._wire_dtype = np.dtype(
                jnp.dtype(cfg.compute_dtype if wire_dtype == "auto"
                          else wire_dtype))
        self.max_batch = int(max_batch)
        self.max_delay_s = float(max_delay_ms) / 1e3
        self.bucket = int(bucket)
        self.pad_value = float(pad_value)
        self.budget_ratio = float(budget_ratio)
        self.max_queue_depth = int(max_queue_depth)
        self.max_request_len = (None if max_request_len is None
                                else int(max_request_len))
        # submit-time length caps, from the same envelope arithmetic the
        # kernel dispatch uses (flash_forward_supported): a request no
        # compiled path can carry is rejected up front instead of failing
        # every rider in its batch downstream. The XLA impl has no kernel
        # envelope (it binds on HBM, for which there is no clean
        # predicate) — cap via max_request_len if needed.
        if attn_impl == "xla":
            self._short_cap: Optional[int] = None
            self._long_cap: Optional[int] = None
        else:
            self._short_cap = _single_chip_max_len(cfg, bucket)
            # ring route: per-device shard is N/P, so the envelope scales
            # by the device count (activations are O(N/P) by design)
            self._long_cap = (self._short_cap * len(self._mesh_devices)
                              if self._long_fwd is not None else None)

        self._q: "queue.Queue" = queue.Queue()
        self._closed = False
        self._lock = threading.Lock()
        self._inflight = 0   # admitted-but-unresolved requests (the HBM
                             # high-water mark max_queue_depth bounds)
        self._stats = dict(requests=0, completed=0, failed=0, rejected=0,
                           expired=0, batches=0,
                           rows_scored=0, rows_padded=0, rows_moved=0,
                           long_requests=0)
        self._batch_hist: Dict[int, int] = defaultdict(int)
        self._latencies: deque = deque(maxlen=latency_window)
        self._pool = ThreadPoolExecutor(max_workers=selection_workers,
                                        thread_name_prefix="vidsum-select")
        self._dispatcher = threading.Thread(target=self._loop, daemon=True,
                                            name="vidsum-dispatch")
        self._dispatcher.start()

    # ------------------------------------------------------------------ API

    def submit(self, features: np.ndarray, *,
               picks: Optional[np.ndarray] = None,
               n_frames: Optional[int] = None,
               change_points: Optional[np.ndarray] = None,
               want_summary: bool = True,
               budget_ratio: Optional[float] = None,
               deadline_s: Optional[float] = None) -> Future:
        """Enqueue one video's features; returns a ``Future[ServeResult]``.

        :param features: (n, in_features) frame features (e.g. GoogLeNet
            pool5 at the sampled fps).
        :param picks: original-frame index per feature row. Defaults to
            ``arange(n)``; required whenever ``n_frames != n`` (the frame
            mapping is not inferable — the offline pipeline gets it from
            ``reduce_fps``).
        :param n_frames: original video frame count (defaults to ``n``).
        :param change_points: (S, 2) inclusive shot bounds in original
            frames (the DSNet h5 layout). When absent and a summary is
            wanted, auto-KTS segments the features exactly like
            ``pipeline._finish_video``.
        :param deadline_s: optional dispatch deadline in seconds from now.
            If the dispatcher reaches the request after it expires, the
            future fails with :class:`DeadlineExceeded` and the request
            never dispatches to the accelerator. (Lazy: the device row was
            already transferred at submit; expiry only saves the compute.)

        :raises ServiceOverloaded: ``max_queue_depth`` admitted requests
            are already unresolved (checked before any device transfer).
        :raises RequestTooLong: no compiled path on this service carries a
            sequence this long.
        """
        feats = np.asarray(features, dtype=np.float32)
        if feats.ndim != 2 or feats.shape[1] != self._cfg.in_features:
            raise ValueError(
                f"features must be (n, {self._cfg.in_features}), got "
                f"{feats.shape}")
        n = feats.shape[0]
        if n == 0:
            raise ValueError("empty feature sequence")
        if n_frames is None:
            n_frames = n
        n_frames = int(n_frames)
        if picks is None:
            if n_frames != n:
                raise ValueError(
                    "picks is required when n_frames != len(features): the "
                    "feature-row -> original-frame mapping is not inferable")
            picks = np.arange(n, dtype=np.int64)
        else:
            picks = np.asarray(picks, dtype=np.int64).reshape(-1)
            if picks.shape[0] != n:
                raise ValueError("picks must have one entry per feature row")
        if change_points is not None:
            change_points = np.asarray(change_points, dtype=np.int64)
            if change_points.ndim != 2 or change_points.shape[1] != 2:
                raise ValueError("change_points must be (S, 2)")
        long = (self._long_fwd is not None
                and n > self._long_threshold)
        # --- admission control: reject BEFORE any padding or device work ---
        cap = self._long_cap if long else self._short_cap
        if self.max_request_len is not None and (
                cap is None or self.max_request_len < cap):
            cap = self.max_request_len
        if cap is not None and n > cap:
            with self._lock:
                self._stats["rejected"] += 1
            route = ("sequence-parallel ring" if long
                     else "single-chip kernel ladder")
            raise RequestTooLong(
                f"request has {n} feature rows but the {route} on this "
                f"service carries at most {cap}"
                + ("" if self.max_request_len is None
                   else f" (max_request_len={self.max_request_len})"))
        with self._lock:
            if self._closed:
                raise RuntimeError("service is closed")
            if self._inflight >= self.max_queue_depth:
                self._stats["rejected"] += 1
                raise ServiceOverloaded(
                    f"{self._inflight} admitted requests are unresolved "
                    f"(max_queue_depth={self.max_queue_depth}); retry "
                    f"after the backlog drains")
            self._inflight += 1   # reserve the slot; released by
            self._stats["requests"] += 1  # _complete/_fail on resolution
        try:
            return self._submit_admitted(
                feats, n, picks, n_frames, change_points, want_summary,
                budget_ratio, deadline_s, long)
        except BaseException:
            with self._lock:   # admission slot back on a failed transfer
                self._inflight -= 1
                self._stats["requests"] -= 1
            raise

    def _submit_admitted(self, feats, n, picks, n_frames, change_points,
                         want_summary, budget_ratio, deadline_s,
                         long) -> Future:
        fut: Future = Future()
        # pad to the length bucket host-side and start the async transfer
        # NOW: the wire (the bottleneck on relay-attached hosts) runs under
        # earlier batches' compute instead of serializing in the dispatcher
        import jax

        dev_idx = -1
        if long:
            # the ring needs equal shards: pad to bucket × n_devices and
            # ship the row seq-sharded at submit time
            granule = self.bucket * len(self._mesh_devices)
            n_bucket = bucket_length(n, granule)
            row = np.full((1, n_bucket, self._cfg.in_features),
                          self.pad_value, dtype=self._wire_dtype)
            row[0, :n] = feats.astype(self._wire_dtype)
            row_dev = jax.device_put(row, self._long_sharding)
        elif self._wire_int8:
            # per-frame symmetric quantization of the padded f32 row; the
            # (n_bucket,) f32 scales ride along (+0.4% wire at d=1024)
            n_bucket = bucket_length(n, self.bucket)
            row = np.full((n_bucket, self._cfg.in_features), self.pad_value,
                          dtype=np.float32)
            row[:n] = feats
            absmax = np.abs(row).max(axis=1)
            scale = np.where(absmax > 0.0, absmax / 127.0,
                             1.0).astype(np.float32)
            q = np.clip(np.round(row / scale[:, None]), -127,
                        127).astype(np.int8)
            row_dev = ((q, scale) if self._wire_coalesced
                       else (jax.device_put(q), jax.device_put(scale)))
        else:
            n_bucket = bucket_length(n, self.bucket)
            row = np.full((n_bucket, self._cfg.in_features), self.pad_value,
                          dtype=self._wire_dtype)
            row[:n] = feats.astype(self._wire_dtype)
            if self._wire_coalesced:
                row_dev = row   # host-side; ships with its batch
            elif self._mesh_devices is None:
                row_dev = jax.device_put(row)
            else:
                # commit rows round-robin over the replicas so the batch
                # assembles from device-resident shards with no extra wire
                with self._lock:
                    dev_idx = self._rr % len(self._mesh_devices)
                    self._rr += 1
                row_dev = jax.device_put(row, self._mesh_devices[dev_idx])
        now = time.monotonic()
        req = _Request(feats=feats, row_dev=row_dev,
                       n_bucket=n_bucket, picks=picks, n_frames=n_frames,
                       change_points=change_points,
                       want_summary=bool(want_summary),
                       budget_ratio=(self.budget_ratio if budget_ratio is None
                                     else float(budget_ratio)),
                       future=fut, t_enq=now,
                       deadline=(None if deadline_s is None
                                 else now + float(deadline_s)),
                       dev_idx=dev_idx, long=long)
        # check-and-enqueue under the same lock close() uses to set the flag
        # and post the sentinel, so a request is either enqueued ahead of
        # the sentinel (and served by the drain) or rejected — never orphaned
        with self._lock:
            if self._closed:
                raise RuntimeError("service is closed")
            self._q.put(req)
        return fut

    def summarize(self, features: np.ndarray, **kw) -> ServeResult:
        """Blocking convenience wrapper around :meth:`submit`."""
        return self.submit(features, **kw).result()

    def warmup(self, lengths: Sequence[int] = (128,),
               batch_sizes: Optional[Sequence[int]] = None) -> list:
        """Pre-compile the (batch, bucket) program grid so first requests
        don't pay the remote compile. Runs through the real dispatch path.
        Returns ``[(n_bucket, batch, seconds), ...]`` — what was warmed and
        what each program cost (near-zero on a persistent-cache hit, so the
        return doubles as a cache-effectiveness report)."""
        if batch_sizes is None:
            batch_sizes = [1]
            while batch_sizes[-1] < self.max_batch:
                batch_sizes.append(batch_sizes[-1] * 2)
        warmed = []
        seen = set()
        for n in lengths:
            n_b = bucket_length(int(n), self.bucket)
            for b in batch_sizes:
                # cap at max_queue_depth too: warmup must not trip its own
                # admission bound, and a batch wider than the depth bound
                # can never assemble in production anyway (at most
                # max_queue_depth requests are ever admitted at once)
                b_eff = min(b, self.max_batch, self.max_queue_depth)
                if (n_b, b_eff) in seen:
                    continue
                seen.add((n_b, b_eff))
                t0 = time.monotonic()
                futs = [self.submit(
                    np.zeros((n_b, self._cfg.in_features), np.float32),
                    want_summary=False) for _ in range(b_eff)]
                for f in futs:
                    f.result()
                warmed.append((n_b, b_eff, time.monotonic() - t0))
        # warmup traffic shouldn't pollute the serving stats
        self.reset_stats()
        return warmed

    def reset_stats(self) -> None:
        with self._lock:
            self._stats = dict(requests=0, completed=0, failed=0, rejected=0,
                               expired=0, batches=0,
                               rows_scored=0, rows_padded=0, rows_moved=0,
                               long_requests=0)
            self._batch_hist = defaultdict(int)
            self._latencies.clear()

    def stats(self) -> ServeStats:
        with self._lock:
            lat = np.asarray(self._latencies, dtype=np.float64)
            s = dict(self._stats)
            hist = dict(self._batch_hist)

        def q(p):
            return float(np.quantile(lat, p)) if lat.size else 0.0

        return ServeStats(batch_hist=hist,
                          latency_mean_s=float(lat.mean()) if lat.size else 0.0,
                          latency_p50_s=q(0.50), latency_p95_s=q(0.95),
                          latency_p99_s=q(0.99), **s)

    def close(self, timeout: Optional[float] = None) -> None:
        """Drain the queue, stop the dispatcher, finish pending selection.

        With a ``timeout``: if the dispatcher is still running when it
        elapses, the worker pool is left up (the dispatcher needs it for
        in-flight work — shutting it down would strand those futures on
        ``RuntimeError('cannot schedule new futures')``); call ``close()``
        again to finish. Idempotent."""
        with self._lock:
            if not self._closed:
                self._closed = True
                self._q.put(_CLOSE)
        self._dispatcher.join(timeout=timeout)
        if self._dispatcher.is_alive():
            return
        self._pool.shutdown(wait=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ------------------------------------------------- future resolution
    # Every admitted request resolves through exactly one of these: they
    # release the admission slot and tolerate caller-cancelled futures
    # (set_* on a CANCELLED future raises InvalidStateError; swallowing it
    # keeps one cancelled rider from stranding the rest of its batch).

    def _complete(self, r: _Request, res: "ServeResult") -> None:
        with self._lock:
            self._stats["completed"] += 1
            self._latencies.append(res.latency_s)
            self._inflight -= 1
        try:
            r.future.set_result(res)
        except InvalidStateError:
            pass

    def _fail(self, r: _Request, exc: BaseException,
              stat: str = "failed") -> None:
        with self._lock:
            self._stats[stat] += 1
            self._inflight -= 1
        try:
            r.future.set_exception(exc)
        except InvalidStateError:
            pass

    def _expire_if_late(self, r: _Request) -> bool:
        """Deadline check at dispatch time; True = dropped (never reaches
        the accelerator)."""
        if r.deadline is None or time.monotonic() <= r.deadline:
            return False
        self._fail(r, DeadlineExceeded(
            f"deadline elapsed {time.monotonic() - r.deadline:.3f}s before "
            f"dispatch"), stat="expired")
        return True

    # ----------------------------------------------------------- dispatcher

    def _loop(self) -> None:
        closing = False
        while not closing:
            req = self._q.get()
            if req is _CLOSE:
                break
            if self._expire_if_late(req):
                continue
            window = [req]
            deadline = time.monotonic() + self.max_delay_s
            while len(window) < self.max_batch:
                remaining = deadline - time.monotonic()
                try:
                    nxt = (self._q.get_nowait() if remaining <= 0
                           else self._q.get(timeout=remaining))
                except queue.Empty:
                    break
                if nxt is _CLOSE:
                    closing = True
                    break
                if not self._expire_if_late(nxt):
                    window.append(nxt)
            self._dispatch_window(window)
        # drain: a submit racing close() can land behind the sentinel
        leftover = []
        while True:
            try:
                r = self._q.get_nowait()
            except queue.Empty:
                break
            if r is not _CLOSE and not self._expire_if_late(r):
                leftover.append(r)
        if leftover:
            self._dispatch_window(leftover)

    def _dispatch_window(self, window: list) -> None:
        groups = defaultdict(list)
        for r in window:
            if r.long:
                self._run_long(r)
            else:
                groups[r.n_bucket].append(r)
        for n_bucket in sorted(groups):
            for start in range(0, len(groups[n_bucket]), self.max_batch):
                self._run_batch(n_bucket,
                                groups[n_bucket][start:start + self.max_batch])

    def _run_batch(self, n_bucket: int, items: list) -> None:
        if self._mesh_devices is not None:
            return self._run_batch_replica(n_bucket, items)
        import jax.numpy as jnp

        b_real = len(items)
        b = _next_pow2(b_real)
        mask = np.ones((b, n_bucket), dtype=bool)
        rows = []
        for i in range(b):
            r = items[i % b_real]   # pad rows reuse device-resident rows:
            rows.append(r.row_dev)  # the batch-dim pad costs zero wire bytes
            mask[i, : r.feats.shape[0]] = False
        try:
            import jax

            if self._wire_int8:
                if self._wire_coalesced:    # one transfer for the batch
                    x = jax.device_put(np.stack([r[0] for r in rows]))
                    s = jax.device_put(np.stack([r[1] for r in rows]))
                else:                       # rows resident since submit()
                    x = jnp.stack([r[0] for r in rows])
                    s = jnp.stack([r[1] for r in rows])
                out = np.asarray(self._fwd_i8(self._params, x, s,
                                              jnp.asarray(mask)),
                                 dtype=np.float32)
            else:
                x = (jax.device_put(np.stack(rows)) if self._wire_coalesced
                     else jnp.stack(rows))
                out = np.asarray(self._fwd(self._params, x,
                                           jnp.asarray(mask)),
                                 dtype=np.float32)
        except Exception as e:  # noqa: BLE001 — fail every rider, keep serving
            for r in items:
                self._fail(r, e)
            return
        with self._lock:
            self._stats["batches"] += 1
            self._stats["rows_scored"] += b_real
            self._stats["rows_padded"] += b - b_real
            self._batch_hist[b_real] += 1
        for i, r in enumerate(items):
            scores = out[i, : r.feats.shape[0]].copy()
            self._pool.submit(self._finish, r, scores)

    def _run_batch_replica(self, n_bucket: int, items: list) -> None:
        """Mesh-mode batch: assemble a batch-sharded global array from the
        device-resident rows (k rows per replica, k the next power of two
        of ``ceil(b_real / R)``) and run the shard_map forward. Rows landed
        round-robin at submit, so a batch drawn from consecutive submits is
        near-balanced; stragglers are re-committed replica-to-replica (ICI,
        never back over the host wire)."""
        import jax
        import jax.numpy as jnp

        devs = self._mesh_devices
        R = len(devs)
        b_real = len(items)
        k = _next_pow2(-(-b_real // R))
        b = R * k
        by_dev: list = [[] for _ in range(R)]
        for r in items:
            by_dev[r.dev_idx].append(r)
        moved = 0
        try:
            # rebalance: replicas holding more than k rows donate to ones
            # holding fewer
            overflow = [r for g in by_dev for r in g[k:]]
            for g in by_dev:
                del g[k:]
            for d in range(R):
                while len(by_dev[d]) < k and overflow:
                    r = overflow.pop()
                    r.row_dev = jax.device_put(r.row_dev, devs[d])
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
                            borrowed = jax.device_put(donor.row_dev, devs[d])
                            moved += 1
                        r = donor
                        rows.append(borrowed)
                    mask[i, : r.feats.shape[0]] = False
            shards = [jnp.stack(rows[d * k:(d + 1) * k]) for d in range(R)]
            x = jax.make_array_from_single_device_arrays(
                (b, n_bucket, self._cfg.in_features), self._rep_sharding,
                shards)
            out = np.asarray(self._rep_fwd(self._params, x,
                                           jnp.asarray(mask)),
                             dtype=np.float32)
        except Exception as e:  # noqa: BLE001 — fail every rider, keep serving
            for r in items:
                self._fail(r, e)
            return
        with self._lock:
            self._stats["batches"] += 1
            self._stats["rows_scored"] += b_real
            self._stats["rows_padded"] += b - b_real
            self._stats["rows_moved"] += moved
            self._batch_hist[b_real] += 1
        for i, r in real_slots:
            self._pool.submit(self._finish, r, out[i, : r.feats.shape[0]]
                              .copy())

    def _run_long(self, r: _Request) -> None:
        """Mesh-mode long request: one sequence-parallel ring pass over all
        devices. No batching — a long video saturates the mesh by itself,
        and its O(N) work dwarfs the dispatch overhead. The dispatcher only
        *launches* the (asynchronous) ring program; the host fetch happens
        on the worker pool, so a multi-second ring pass never head-of-line
        blocks the short-request batches behind it."""
        import jax.numpy as jnp

        n = r.feats.shape[0]
        mask = np.ones((1, r.n_bucket), dtype=bool)
        mask[0, :n] = False
        try:
            out_dev = self._long_fwd(self._params, r.row_dev,
                                     jnp.asarray(mask))
        except Exception as e:  # noqa: BLE001 — keep serving
            self._fail(r, e)
            return
        with self._lock:
            self._stats["batches"] += 1
            self._stats["rows_scored"] += 1
            self._stats["long_requests"] += 1

        def fetch_and_finish():
            try:
                out = np.asarray(out_dev, dtype=np.float32)
            except Exception as e:  # noqa: BLE001 — device-side failure
                self._fail(r, e)
                return
            self._finish(r, out[0, :n].copy())

        self._pool.submit(fetch_and_finish)

    # ------------------------------------------------------- shot selection

    def _finish(self, r: _Request, scores: np.ndarray) -> None:
        try:
            summary = cps = None
            if r.want_summary:
                cps = r.change_points
                if cps is None:
                    cps = self._auto_segments(r.feats, r.n_frames)
                [summary] = generate_summary([cps], [scores], [r.n_frames],
                                             [r.picks],
                                             budget_ratio=r.budget_ratio)
            res = ServeResult(scores=scores, summary=summary,
                              change_points=cps, n_frames=r.n_frames,
                              latency_s=time.monotonic() - r.t_enq)
            self._complete(r, res)
        except Exception as e:  # noqa: BLE001 — propagate into the future
            self._fail(r, e)

    def _auto_segments(self, feats: np.ndarray, n_frames: int) -> np.ndarray:
        """Auto-KTS shot bounds, arithmetic-identical to
        ``pipeline._finish_video`` (float64 gram, ncp = n//25, sampled-space
        bounds scaled to original frames)."""
        n = feats.shape[0]
        g = feats.astype(np.float64)
        cps, _ = kts_segmentation(g @ g.T, max(n // 25, 1), vmax=1.0)
        bounds = change_points_from_cps(cps, n)
        if n_frames == n:
            return bounds
        ratio = n_frames / n
        starts = np.round(bounds[:, 0] * ratio).astype(np.int64)
        ends = np.concatenate([starts[1:] - 1, [n_frames - 1]])
        return np.stack([starts, ends], axis=1)
