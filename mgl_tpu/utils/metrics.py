"""Lightweight counters/timers + profiler hooks.

The reference ships no tracing or metrics (SURVEY.md §5: closest artifacts
are #ifdef DEBUG_PRINT dumps).  This module provides the production-side
observability the rebuild adds: cheap host-side counters, wall-clock
scopes, and a jax.profiler trace context for xprof captures.
"""

from __future__ import annotations

import collections
import contextlib
import json
import threading
import time


class Metrics:
    """Process-wide counters and timing accumulators (thread-safe: the
    engine's streaming mode accumulates from overlapped batch workers)."""

    def __init__(self):
        self.counters: dict[str, float] = collections.defaultdict(float)
        self.timers: dict[str, float] = collections.defaultdict(float)
        self.calls: dict[str, int] = collections.defaultdict(int)
        self._lock = threading.Lock()

    def count(self, name: str, value: float = 1.0) -> None:
        with self._lock:
            self.counters[name] += value

    @contextlib.contextmanager
    def timer(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                self.timers[name] += dt
                self.calls[name] += 1

    def snapshot(self) -> dict:
        return {
            "counters": dict(self.counters),
            "timers_s": {k: round(v, 6) for k, v in self.timers.items()},
            "calls": dict(self.calls),
        }

    def dump(self) -> str:
        return json.dumps(self.snapshot())

    def reset(self) -> None:
        self.counters.clear()
        self.timers.clear()
        self.calls.clear()


METRICS = Metrics()


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/mgl_tpu_trace"):
    """Capture a jax.profiler trace (open with xprof/tensorboard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
