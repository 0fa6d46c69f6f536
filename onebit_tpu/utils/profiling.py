"""Profiling/tracing: the reference has only wall-clock ETA logging
(SURVEY.md §5 tracing row); TPU-native observability is a jax.profiler
trace (Perfetto-compatible) plus simple throughput counters.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace viewable in Perfetto/TensorBoard."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """tokens/s (or any unit/s) counter with EMA smoothing."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.rate: Optional[float] = None
        self._last: Optional[float] = None

    def tick(self, units: float) -> float:
        now = time.perf_counter()
        if self._last is not None:
            inst = units / max(now - self._last, 1e-9)
            self.rate = (inst if self.rate is None
                         else self.ema * self.rate + (1 - self.ema) * inst)
        self._last = now
        return self.rate or 0.0
