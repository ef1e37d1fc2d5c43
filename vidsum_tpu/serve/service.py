"""The micro-batching scoring service: admission, dispatch, selection.

Orchestrates the serving package: requests enter through
:meth:`ScoringService.submit` (admission control + submit-time wire
transfer), a dispatcher thread micro-batches them onto the accelerator
(``serve/transport.py`` owns the wire bytes, ``serve/mesh.py`` the
multi-chip placement), and host-side shot selection (the bit-parity
KTS + knapsack pipeline of ``ops/{kts,summary,knapsack}``) runs on a
worker pool so the dispatcher is back on the accelerator while the CPU
picks shots. Architecture rationale: ``vidsum_tpu/serve/__init__.py``."""

from __future__ import annotations

import queue
import threading
import time
from collections import defaultdict, deque
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Dict, Optional, Sequence

import numpy as np

from vidsum_tpu.config import ModelConfig
from vidsum_tpu.data.collate import bucket_length
from vidsum_tpu.serve import admission, dispatch, transport
from vidsum_tpu.serve import mesh as mesh_mod
from vidsum_tpu.serve.mesh import _single_chip_max_len
from vidsum_tpu.serve.types import (
    _CLOSE, ServeResult, ServeStats, _Request, normalize_request,
)


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
    :param wire_dtype: dtype of the host→device feature transfer —
        ``"auto"`` (default, lossless: matches ``cfg.compute_dtype``),
        ``"float32"``, or the opt-in LOSSY ``"int8"``; trade-offs in
        ``serve/transport.py``. On a mesh service the int8 wire applies
        to replica-batched short requests; ring-routed long requests stay
        on the lossless wire.
    :param wire_mode: ``"rows"`` (default: submit-time async transfers,
        zero wire bytes for batch padding) or ``"coalesced"`` (one stacked
        transfer per micro-batch, single-chip only; best on high-RPC-cost
        relay links). Bit-identical scores either way —
        ``serve/transport.py``.
    :param mesh: optional ``jax.sharding.Mesh`` — serve over ALL its
        devices: short requests batch replica-parallel across them, long
        requests run the sequence-parallel ring (``serve/mesh.py``). Axis
        names are ignored; the device set is what matters.
    :param long_threshold: feature-row count above which a request takes
        the sequence-parallel route (mesh mode only). Default: the largest
        length the single-chip kernel ladder supports. Set lower to trade
        program count for long-tail latency (a ring pass over P chips is
        ~P× faster than one chip at the same N).
    :param max_queue_depth: admission bound — maximum admitted-but-
        unresolved requests. Each admitted request pins one padded feature
        row in device HBM (by design: the async transfer overlaps earlier
        batches' compute), so this bound is the serving memory bound. Past
        it ``submit()`` raises :class:`ServiceOverloaded` *before* any
        host-side padding or device transfer.
    :param max_request_len: optional operator cap on feature rows per
        request, checked at submit time on top of the automatic kernel-
        envelope caps. ``None`` = envelope caps only.
    :param rss_watermark_mb: optional host-RSS shed threshold: past it,
        ``submit()`` rejects with :class:`ServiceOverloaded` and logs
        loudly (rate-limited). Protection against the measured axon-relay
        per-request host leak (PERF.md "Endurance"); pair with worker
        recycling (``cli.serve --recycle_after_mb``) for full mitigation.
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
                 rss_watermark_mb: Optional[float] = None,
                 mesh=None, long_threshold: Optional[int] = None) -> None:
        import jax

        from vidsum_tpu.train.steps import make_eval_forward

        if attn_impl is None:
            attn_impl = ("pallas_block" if jax.default_backend() == "tpu"
                         else "xla")
        self._cfg = cfg
        self._params = params
        self._fwd = make_eval_forward(cfg, attn_impl=attn_impl)
        # --- mesh mode (replica-parallel batches + seq-parallel longs) ---
        routing = mesh_mod.build_mesh_routing(cfg, mesh, attn_impl, bucket,
                                              long_threshold)
        # flattened onto the service so tests/tools can introspect and
        # monkeypatch the routes (e.g. the slow-fetch liveness pin wraps
        # _long_fwd); None everywhere = single-chip service
        self._mesh_devices = routing.devices if routing else None
        self._rep_fwd = routing.rep_fwd if routing else None
        self._rep_sharding = routing.rep_sharding if routing else None
        self._rep_scale_sharding = routing.scale_sharding if routing else None
        self._long_fwd = routing.long_fwd if routing else None
        self._long_sharding = routing.long_sharding if routing else None
        self._long_threshold = routing.long_threshold if routing else None
        self._rr = 0
        # --- wire transport (serve/transport.py owns the bytes) ---
        self._wire = transport.resolve_wire(cfg, wire_dtype, wire_mode,
                                            self._mesh_devices is not None,
                                            self._fwd)
        self._wire_coalesced = self._wire.coalesced
        self._wire_int8 = self._wire.int8
        self._wire_dtype = self._wire.dtype
        if self._wire_int8:
            self._fwd_i8 = self._wire.fwd_i8
            if self._mesh_devices is not None:
                self._rep_fwd_i8 = mesh_mod.make_replica_forward_int8(
                    cfg, self._rep_fwd)
        self.max_batch = int(max_batch)
        self.max_delay_s = float(max_delay_ms) / 1e3
        self.bucket = int(bucket)
        self.pad_value = float(pad_value)
        self.budget_ratio = float(budget_ratio)
        self.max_queue_depth = int(max_queue_depth)
        self.max_request_len = (None if max_request_len is None
                                else int(max_request_len))
        self.rss_watermark_mb = (None if rss_watermark_mb is None
                                 else float(rss_watermark_mb))
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
        self._stats = self._zero_stats()
        self._batch_hist: Dict[int, int] = defaultdict(int)
        self._latencies: deque = deque(maxlen=latency_window)
        self._pool = ThreadPoolExecutor(max_workers=selection_workers,
                                        thread_name_prefix="vidsum-select")
        self._dispatcher = threading.Thread(
            target=dispatch.dispatcher_loop, args=(self,), daemon=True,
            name="vidsum-dispatch")
        self._dispatcher.start()

    _zero_stats = staticmethod(ServeStats.zero_raw)

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
        feats, n, picks, n_frames, change_points = normalize_request(
            features, picks, n_frames, change_points, self._cfg.in_features)
        long = (self._long_fwd is not None
                and n > self._long_threshold)
        # admission: reject BEFORE any padding or device work, else
        # reserve a slot (serve/admission.py)
        admission.admit(self, n, long)
        try:
            return self._submit_admitted(
                feats, n, picks, n_frames, change_points, want_summary,
                budget_ratio, deadline_s, long)
        except BaseException:
            admission.release_failed_submit(self)
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
            # ship seq-sharded, always on the lossless wire
            granule = self.bucket * len(self._mesh_devices)
            n_bucket = bucket_length(n, granule)
            dtype = (np.dtype(np.float32) if self._wire_int8
                     else self._wire_dtype)
            row_dev = mesh_mod.build_long_row(
                feats, n_bucket, self._cfg.in_features, self.pad_value,
                dtype, self._long_sharding)
        else:
            n_bucket = bucket_length(n, self.bucket)
            payload = transport.build_short_row(
                self._wire, feats, n_bucket, self._cfg.in_features,
                self.pad_value)
            if self._wire_coalesced:
                row_dev = payload   # host-side; ships with its batch
            elif self._mesh_devices is None:
                row_dev = (tuple(jax.device_put(p) for p in payload)
                           if self._wire_int8 else jax.device_put(payload))
            else:
                # commit rows round-robin over the replicas so the batch
                # assembles from device-resident shards with no extra wire
                with self._lock:
                    dev_idx = self._rr % len(self._mesh_devices)
                    self._rr += 1
                dev = self._mesh_devices[dev_idx]
                row_dev = (tuple(jax.device_put(p, dev) for p in payload)
                           if self._wire_int8
                           else jax.device_put(payload, dev))
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

        Requested batch sizes are capped at ``max_batch`` AND at the
        service's current admission headroom (``max_queue_depth`` minus
        requests already in flight — warmup must not trip its own bound,
        and a batch wider than the depth bound can never assemble in
        production anyway); the capped (bucket, batch) grid is
        deduplicated, so callers passing an explicit grid can get fewer
        entries back than they asked for.

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
                # live headroom, not the static bound: production traffic
                # already in flight must not make warmup reject itself
                # (ADVICE r4)
                with self._lock:
                    headroom = max(1, self.max_queue_depth - self._inflight)
                b_eff = min(b, self.max_batch, headroom)
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
            self._stats = self._zero_stats()
            self._batch_hist = defaultdict(int)
            self._latencies.clear()

    def stats(self) -> ServeStats:
        with self._lock:
            s = dict(self._stats)
            hist = dict(self._batch_hist)
            lat = tuple(self._latencies)
        return ServeStats.from_raw(s, hist, lat)

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
    # Thin delegates to serve/admission.py (the slot lifecycle), kept as
    # methods so dispatch code and tests address them on the service.

    def _complete(self, r: _Request, res: "ServeResult") -> None:
        admission.complete(self, r, res)

    def _fail(self, r: _Request, exc: BaseException,
              stat: str = "failed") -> None:
        admission.fail(self, r, exc, stat)

    def _expire_if_late(self, r: _Request) -> bool:
        return admission.expire_if_late(self, r)

    # --------------------------------------------------------- accounting
    # (called by serve/dispatch.py, which owns the dispatcher loop, batch
    # runs, long-route launches, and host-side selection)

    def _account_batch(self, b_real: int, b: int, moved: int = 0) -> None:
        with self._lock:
            self._stats["batches"] += 1
            self._stats["rows_scored"] += b_real
            self._stats["rows_padded"] += b - b_real
            self._stats["rows_moved"] += moved
            self._batch_hist[b_real] += 1
