"""Tracing and performance counters.

The reference has no tracing/profiling at all (SURVEY.md §5 — the closest
artifact is the readout-mitigation timing in stored hardware metadata).
This module provides the framework's observability layer:

* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace directory;
* :class:`Counter` — wall-clock + derived-rate counters (shots/sec, GB/s)
  used by the bench runners;
* :func:`timed` — block-until-ready timing helper for jitted callables.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable, Dict, Optional


@contextlib.contextmanager
def trace(logdir: str = "/tmp/qcmrf_trace"):
    """Profile a region with jax.profiler (view with TensorBoard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def timed(fn: Callable, *args, reps: int = 10, warmup: int = 1) -> float:
    """Average seconds per call, synchronized on device completion."""
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


@dataclasses.dataclass
class Counter:
    """Accumulates work items and elapsed time; reports rates."""

    items: float = 0.0
    bytes: float = 0.0
    seconds: float = 0.0

    def add(self, items: float = 0.0, nbytes: float = 0.0,
            seconds: float = 0.0) -> None:
        self.items += items
        self.bytes += nbytes
        self.seconds += seconds

    @property
    def items_per_sec(self) -> float:
        return self.items / self.seconds if self.seconds else 0.0

    @property
    def gb_per_sec(self) -> float:
        return self.bytes / self.seconds / 1e9 if self.seconds else 0.0

    def report(self) -> Dict[str, float]:
        return {
            "items": self.items,
            "seconds": round(self.seconds, 6),
            "items_per_sec": round(self.items_per_sec, 1),
            "gb_per_sec": round(self.gb_per_sec, 3),
        }


@contextlib.contextmanager
def stopwatch(counter: Counter, items: float = 0.0, nbytes: float = 0.0,
              sync: Optional[object] = None):
    """Time a block into a counter; pass ``sync=jax`` to block on device."""
    t0 = time.perf_counter()
    yield
    if sync is not None:
        import jax

        # sync the default device stream by a trivial transfer
        jax.device_get(jax.numpy.zeros(()))
    counter.add(items=items, nbytes=nbytes,
                seconds=time.perf_counter() - t0)
