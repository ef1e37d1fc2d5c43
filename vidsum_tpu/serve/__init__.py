"""Online serving: micro-batched TPU scoring behind a request queue.

The reference has no serving story — scoring only exists as an offline val
pass over h5 files (``src/train.py:134-152``). Production deployment is the
opposite shape: requests arrive one at a time, at unpredictable lengths, and
the accelerator wants large *static-shape* batches. This package bridges
the two the TPU way:

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
  is the serving bottleneck — PERF.md "Serving"): ``serve/transport.py``
  owns the transports — submit-time async rows (zero wire bytes for batch
  padding), a coalesced one-transfer-per-batch mode for high-RPC-cost
  links, a lossless bf16 wire, and an opt-in lossy int8 wire (per-frame
  symmetric quantization dequantized on device);
- shot selection (KTS + knapsack, the bit-parity host pipeline of
  ``ops/{kts,summary,knapsack}``) runs on a worker pool, so the dispatcher
  is back on the accelerator while the CPU picks shots.

Single-host by design: one process owns its chips and the queue. Passing a
``mesh`` turns on the multi-chip modes (``serve/mesh.py``), both behind the
same ``submit()``: replica-parallel short batches over every mesh device,
and sequence-parallel ring scoring for requests past the single-chip
kernel envelope. Cross-host serving composes externally: run one service
per host behind any load balancer (requests are independent; there is no
cross-request state).

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

Package layout: ``types.py`` (results/stats/errors), ``transport.py``
(wire bytes), ``mesh.py`` (multi-chip placement), ``service.py`` (the
:class:`ScoringService` orchestrator). The HTTP front-end is the sibling
module ``vidsum_tpu/serve_http.py``.
"""

from vidsum_tpu.serve.mesh import _single_chip_max_len  # noqa: F401 (tests)
from vidsum_tpu.serve.service import ScoringService
from vidsum_tpu.serve.types import (
    DeadlineExceeded, RequestTooLong, ServeResult, ServeStats,
    ServiceOverloaded,
)

__all__ = [
    "ScoringService", "ServeResult", "ServeStats",
    "ServiceOverloaded", "RequestTooLong", "DeadlineExceeded",
]
