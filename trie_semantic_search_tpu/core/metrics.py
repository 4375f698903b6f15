"""Metrics collection and profiling hooks.

Rebuild of the reference's observability surface (SURVEY.md §5):
``tracing``-style structured logging lives in :mod:`.logging`; this module
adds the pieces the reference configured but never shipped —

* a process-wide counters/histogram registry (query counts, latency
  percentiles) feeding ``GET /stats``
* a periodic metrics reporter honouring ``logging.enable_metrics`` /
  ``metrics_interval_seconds`` (ref config.rs:299-301)
* ``jax.profiler`` trace capture around the jit'd query step
  (SURVEY.md §5: "plus jax.profiler trace hooks around the query step").
"""

from __future__ import annotations

import bisect
import contextlib
import logging
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Iterator, Optional

_log = logging.getLogger("tss_tpu.metrics")


@dataclass
class LatencyHistogram:
    """Bounded reservoir of latencies with percentile queries."""

    max_samples: int = 4096
    _samples: list[float] = field(default_factory=list)
    _lock: threading.Lock = field(default_factory=threading.Lock)
    count: int = 0
    total_ms: float = 0.0

    def observe(self, ms: float) -> None:
        with self._lock:
            self.count += 1
            self.total_ms += ms
            bisect.insort(self._samples, ms)
            if len(self._samples) > self.max_samples:
                # drop alternating extremes to keep the distribution shape
                del self._samples[0 if self.count % 2 else -1]

    def percentile(self, p: float) -> Optional[float]:
        with self._lock:
            if not self._samples:
                return None
            idx = min(len(self._samples) - 1, int(p / 100 * len(self._samples)))
            return self._samples[idx]

    def summary(self) -> dict:
        return {
            "count": self.count,
            "mean_ms": (self.total_ms / self.count) if self.count else None,
            "p50_ms": self.percentile(50),
            "p95_ms": self.percentile(95),
            "p99_ms": self.percentile(99),
        }


class MetricsRegistry:
    """Named counters + latency histograms."""

    def __init__(self) -> None:
        self._counters: dict[str, int] = {}
        self._histograms: dict[str, LatencyHistogram] = {}
        self._lock = threading.Lock()

    def inc(self, name: str, by: int = 1) -> None:
        with self._lock:
            self._counters[name] = self._counters.get(name, 0) + by

    def histogram(self, name: str) -> LatencyHistogram:
        with self._lock:
            h = self._histograms.get(name)
            if h is None:
                h = self._histograms[name] = LatencyHistogram()
            return h

    @contextlib.contextmanager
    def timed(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.histogram(name).observe((time.perf_counter() - t0) * 1000)

    def snapshot(self) -> dict:
        with self._lock:
            return {
                "counters": dict(self._counters),
                "latency": {k: h.summary() for k, h in self._histograms.items()},
            }


#: process-wide default registry
metrics = MetricsRegistry()


class MetricsReporter:
    """Periodic metrics-snapshot logger
    (ref: logging.metrics_interval_seconds, config.rs:299-301). Thin
    wrapper over :class:`..maintenance.PeriodicTask` — one thread-loop
    implementation for all maintenance."""

    def __init__(
        self,
        interval_seconds: float = 60.0,
        extra: Optional[Callable[[], dict]] = None,
        registry: Optional[MetricsRegistry] = None,
    ):
        from .maintenance import PeriodicTask

        self.extra = extra
        self.registry = registry or metrics
        self._task = PeriodicTask("metrics", interval_seconds, self._report)

    def _report(self) -> None:
        snap = self.registry.snapshot()
        if self.extra:
            try:
                snap["system"] = self.extra()
            except Exception as e:
                snap["system"] = {"error": str(e)}
        _log.info("metrics: %s", snap)

    def start(self) -> None:
        self._task.start()

    def stop(self) -> None:
        self._task.stop()


@contextlib.contextmanager
def profile_trace(log_dir: str) -> Iterator[None]:
    """Capture a ``jax.profiler`` device trace around a code block (view in
    TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
