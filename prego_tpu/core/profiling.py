"""Tracing / profiling utilities.

The reference has only (broken) wall-clock FPS logging (SURVEY.md §5).
First-class here:
  * ``trace(logdir)`` — context manager around jax.profiler for TensorBoard
    -viewable device traces;
  * ``annotate(name)`` — jax.profiler.TraceAnnotation pass-through;
  * ``ThroughputMeter`` — steady-state items/sec with warmup discard and a
    device-sync callback (on tunneled TPU platforms block_until_ready can
    return early, so callers sync via a scalar fetch — see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


@dataclass
class ThroughputMeter:
    """Accumulates (items, seconds) intervals; warmup intervals discarded."""

    warmup: int = 1
    sync: Optional[Callable[[], None]] = None
    _intervals: List = field(default_factory=list)
    _t0: Optional[float] = None

    def start(self):
        if self.sync is not None:
            self.sync()
        self._t0 = time.perf_counter()

    def stop(self, items: int):
        if self.sync is not None:
            self.sync()
        assert self._t0 is not None, "stop() without start()"
        self._intervals.append((items, time.perf_counter() - self._t0))
        self._t0 = None

    @property
    def items_per_sec(self) -> float:
        kept = self._intervals[self.warmup :] or self._intervals
        items = sum(i for i, _ in kept)
        secs = sum(s for _, s in kept)
        return items / secs if secs > 0 else 0.0

    @property
    def intervals(self) -> List:
        return list(self._intervals)
