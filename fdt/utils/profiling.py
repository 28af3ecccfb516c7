"""Timing & tracing harness.

The reference instruments stages with ad-hoc time.clock() pairs and prints
(pyramid.py:227-350, MTCNN detect.py:595-618, MyTrain_repo.py:190).  The TPU
equivalents here: a `block_until_ready`-aware Timer/benchmark pair for honest
device timing, and a jax.profiler trace context for per-op breakdowns
(view with TensorBoard or xprof).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


class Timer:
    """Accumulating named wall-clock timer (device-synchronized)."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        return " | ".join(f"{k}: {v * 1000 / max(self.counts[k], 1):.2f}ms"
                          for k, v in self.totals.items())


def benchmark(fn: Callable, *args, iters: int = 10, warmup: int = 2) -> float:
    """Median-free simple throughput timing: returns seconds per call.
    Dispatches `iters` calls and blocks on the last result (in-order device
    execution makes this exact)."""
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/fdt_trace"):
    """jax.profiler trace context (open with TensorBoard's profile plugin)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
