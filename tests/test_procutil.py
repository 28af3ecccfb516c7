"""fdt/dist/procutil.py — the shared multi-process job plumbing.

These pin the exact failure modes that motivated the helper (review findings
on the bench/test copies it replaced): a failing worker must not strand a
sibling as a stray process, and the job deadline must be SHARED across
workers, not granted afresh to each.
"""
import os
import subprocess
import sys
import time

import pytest

from fdt.dist.procutil import (COLLECTIVE_TERMINATE_S, WorkerFailure,
                               child_env, free_port, python_workers,
                               run_workers)


def _alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        return True
    except OSError:
        return False


def test_failing_worker_fails_fast_and_kills_sibling(tmp_path):
    """Worker 0 exits nonzero immediately; worker 1 would sleep for minutes.

    run_workers must raise WorkerFailure promptly (not burn the deadline
    waiting on the doomed sibling) and reap BOTH — the old per-worker pattern
    left the sleeper alive as a stray.
    """
    pid_file = tmp_path / "sleeper.pid"
    sleeper = ("import os, sys, time\n"
               f"open({str(pid_file)!r}, 'w').write(str(os.getpid()))\n"
               "print('x' * 100000)\n"   # >64KB: would stall a pipe design
               "time.sleep(300)\n")
    t0 = time.monotonic()
    with pytest.raises(WorkerFailure) as ei:
        python_workers([["-c", "import sys; print('boom', file=sys.stderr); "
                         "sys.exit(3)"],
                        ["-c", sleeper]], timeout=120.0)
    elapsed = time.monotonic() - t0
    assert ei.value.index == 0 and ei.value.returncode == 3
    assert "boom" in ei.value.stderr  # the GUILTY worker's stderr surfaces
    assert elapsed < 30  # fail-fast, not the 120s deadline
    pid = int(pid_file.read_text())
    assert not _alive(pid)


def test_shared_deadline_not_per_worker():
    """Two 20s sleepers under a 3s job deadline: TimeoutExpired in ~3s
    (shared), not ~6s+ (per-worker), and both children are gone after."""
    prog = "import time; time.sleep(20)"
    t0 = time.monotonic()
    with pytest.raises(subprocess.TimeoutExpired):
        python_workers([["-c", prog], ["-c", prog]], timeout=3.0)
    assert time.monotonic() - t0 < 10


def test_child_env_replaces_device_count_and_appends_timeouts():
    base = dict(os.environ)
    base["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=8 "
                         "--xla_something_else=1")
    env = child_env(4, base=base)
    flags = env["XLA_FLAGS"].split()
    assert "--xla_force_host_platform_device_count=4" in flags
    assert "--xla_force_host_platform_device_count=8" not in flags
    assert "--xla_something_else=1" in flags  # unrelated flags preserved
    assert (f"--xla_cpu_collective_call_terminate_timeout_seconds="
            f"{COLLECTIVE_TERMINATE_S}") in flags


def test_run_workers_returns_in_cmd_order():
    results = run_workers(
        [[sys.executable, "-c", "print('a')"],
         [sys.executable, "-c", "print('b')"]], timeout=60.0)
    assert [r[1].strip() for r in results] == ["a", "b"]
    assert all(r[0] == 0 for r in results)


def test_free_port_is_bindable():
    import socket
    port = free_port()
    s = socket.socket()
    s.bind(("127.0.0.1", port))
    s.close()
