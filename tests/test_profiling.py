"""fdt/utils/profiling.py — the timing/tracing harness.

TPU-side timing numbers (bench.py, scripts/profile_*.py) flow through these
helpers, so their accounting must be right: sections accumulate and
device-sync before stamping, benchmark amortizes over iters after warmup,
and the profiler trace context actually writes a trace.
"""
import glob
import os
import time

import jax.numpy as jnp

from fdt.utils.profiling import Timer, benchmark, trace


def test_timer_accumulates_and_reports():
    t = Timer()
    for _ in range(3):
        with t.section("step"):
            time.sleep(0.01)
    with t.section("other", sync=jnp.ones(8) * 2):  # device-sync path
        pass
    assert t.counts["step"] == 3
    assert t.totals["step"] >= 0.03
    rep = t.report()
    assert "step:" in rep and "other:" in rep and "ms" in rep
    # report shows per-call mean, not the total
    step_ms = float(rep.split("step: ")[1].split("ms")[0])
    assert 10.0 <= step_ms < 1000.0


def test_benchmark_returns_seconds_per_call():
    calls = []

    def fn(x):
        calls.append(1)
        time.sleep(0.005)
        return x

    sec = benchmark(fn, jnp.ones(4), iters=4, warmup=2)
    assert len(calls) == 6  # warmup + iters, each dispatched exactly once
    assert 0.004 <= sec < 1.0  # per-call, not the 4-call total


def test_trace_writes_profile(tmp_path):
    log_dir = str(tmp_path / "trace")
    with trace(log_dir) as d:
        assert d == log_dir
        jnp.square(jnp.arange(16.0)).block_until_ready()
    dumped = glob.glob(os.path.join(log_dir, "**", "*"), recursive=True)
    assert any(os.path.isfile(f) for f in dumped)  # a trace artifact exists
