"""Tracing / profiling (SURVEY.md §5 — the reference has only wall-clock
``time.time()`` pairs around epochs, ``src/train.py:74,81-83``).

- :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace of the device timeline.
- :class:`StepTimer` — cheap per-step wall-clock accumulator with percentile
  summary; used by the training drivers when ``profile_dir`` is set.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Profile the enclosed block to ``log_dir`` (no-op when None)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self) -> None:
        self.durations: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self) -> "StepTimer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        assert self._t0 is not None
        self.durations.append(time.perf_counter() - self._t0)
        self._t0 = None

    def summary(self) -> Dict[str, float]:
        if not self.durations:
            return {}
        d = sorted(self.durations)
        n = len(d)
        return {
            "steps": n,
            "mean_s": sum(d) / n,
            "p50_s": d[n // 2],
            "p90_s": d[min(int(n * 0.9), n - 1)],
            "max_s": d[-1],
        }
