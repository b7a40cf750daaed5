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


def top_ops(trace_dir: str, k: int = 25) -> list[tuple[str, float]]:
    """Parse the newest Perfetto trace under ``trace_dir`` and return the
    top-k (op name, total ms) device entries — a TensorBoard-free way to see
    where a step spends its time (this is how the pad/relayout and RNG
    pathologies in README 'Benchmarks' were found)."""
    import collections
    import glob
    import gzip
    import json
    import os

    files = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
        reverse=True,
    )
    if not files:
        raise FileNotFoundError(f"no *.trace.json.gz under {trace_dir}")
    events = json.load(gzip.open(files[0]))["traceEvents"]
    total = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            if name.startswith("$") or name.startswith("jit_"):
                continue  # python frames / whole-program entries
            total[name] += e["dur"]
    return [(name, d / 1e3) for name, d in total.most_common(k)]


def profile_top_ops(fn: Callable, *args, trace_dir: str = "/tmp/pygat_trace",
                    k: int = 25) -> list[tuple[str, float]]:
    """Run ``fn(*args)`` once under a device trace and return its top ops."""
    out = fn(*args)  # warmup/compile outside the trace
    jax.block_until_ready(out)
    with trace(trace_dir):
        out = fn(*args)
        jax.block_until_ready(out)
    return top_ops(trace_dir, k=k)


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
