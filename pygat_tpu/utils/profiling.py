"""Profiling hooks: jax.profiler traces + per-step wall timing.

The reference's only observability is time.time() deltas in the train loop
(reference train.py:155,177); this adds real device traces (viewable in
TensorBoard / Perfetto) and a cheap step timer that distinguishes dispatch
from device time.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/pygat_trace"):
    """Capture a device trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the trace timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Wall-clock step timing with explicit device sync.

    ``timed(fn)`` returns a wrapped fn that blocks on the result, so the
    recorded time is dispatch + device execution (what an epoch costs),
    not just async enqueue.
    """

    def __init__(self):
        self.times_ms: list[float] = []

    def timed(self, fn: Callable) -> Callable:
        def wrapped(*args, **kw):
            t0 = time.perf_counter()
            out = fn(*args, **kw)
            jax.block_until_ready(out)
            self.times_ms.append((time.perf_counter() - t0) * 1e3)
            return out

        return wrapped

    def summary(self) -> dict:
        if not self.times_ms:
            return {"steps": 0}
        xs = sorted(self.times_ms)
        n = len(xs)
        return {
            "steps": n,
            "mean_ms": sum(xs) / n,
            "p50_ms": xs[n // 2],
            "p90_ms": xs[min(n - 1, int(n * 0.9))],
            "min_ms": xs[0],
            "max_ms": xs[-1],
        }
