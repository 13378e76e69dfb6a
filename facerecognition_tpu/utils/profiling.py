"""Profiling and throughput instrumentation.

The reference has only ad-hoc wall-clock prints (SURVEY.md §5); here:
- :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace directory.
- :class:`ThroughputCounter` — rolling faces/sec + latency percentiles, the
  first-class counters the serving paths report.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/frt_trace") -> Iterator[None]:
    """Capture a jax.profiler trace for the enclosed block.

    View with TensorBoard or Perfetto (trace.json.gz inside ``log_dir``).
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputCounter:
    """Rolling throughput + latency percentiles over the last N events."""

    def __init__(self, window: int = 256):
        self.window = window
        self._events: deque[tuple[float, int, float]] = deque(maxlen=window)

    def record(self, n_items: int, seconds: float) -> None:
        self._events.append((time.time(), n_items, seconds))

    @contextlib.contextmanager
    def measure(self, n_items: int = 1) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.record(n_items, time.perf_counter() - t0)

    def stats(self) -> dict:
        if not self._events:
            return {"items_per_sec": 0.0, "p50_ms": 0.0, "p95_ms": 0.0, "n": 0}
        total_items = sum(n for _, n, _ in self._events)
        total_time = sum(s for _, _, s in self._events)
        lat = sorted(s / max(n, 1) for _, n, s in self._events)

        def pct(p: float) -> float:
            i = min(int(len(lat) * p), len(lat) - 1)
            return lat[i] * 1e3

        return {
            "items_per_sec": total_items / max(total_time, 1e-9),
            "p50_ms": pct(0.50),
            "p95_ms": pct(0.95),
            "n": len(self._events),
        }
