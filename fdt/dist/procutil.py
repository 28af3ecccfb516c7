"""Multi-process worker-job plumbing shared by the tests and bench.py.

The reference is single-process (SURVEY §2.9); this repo's multi-host layer
(fdt/dist/multihost.py) is exercised by launching real worker processes that
form a Gloo cluster over virtual CPU devices.  On this 1-core host XLA:CPU
collectives have a known nondeterministic rendezvous deadlock, so every such
job must run under

  (a) collective terminate timeouts baked into XLA_FLAGS (turns a deadlock
      into a fast, explicit worker failure), and
  (b) ONE shared wall-clock deadline for the whole job with
      kill-everything cleanup — a failing or wedged worker must never strand
      its siblings (undrained PIPEs block a child forever once the 64 KB
      buffer fills) nor grant later workers a fresh full timeout that blows
      a test's hang-watchdog budget.

Keeping this logic in one place also keeps the XLA flag set and timeouts
identical between the tested configuration and the bench artifact.
Stdlib-only on purpose: callers run it before or without touching jax.
"""
from __future__ import annotations

import os
import socket
import subprocess
import sys
import time

# Terminate timeout chosen after observing the flake live: the plugin can
# legitimately idle >60s at init on this box, so anything lower false-kills.
COLLECTIVE_TERMINATE_S = 120


def free_port() -> int:
    """An OS-assigned free TCP port for the jax.distributed coordinator."""
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def child_env(local_devices: int, base: dict | None = None) -> dict:
    """Environment for a worker with `local_devices` virtual CPU devices.

    REPLACES any inherited device-count flag (the test suite exports =8 for
    itself; append-if-missing would leave each child with 8 local devices and
    silently double the global mesh), then appends the deadlock fail-fast
    timeouts if absent.
    """
    env = dict(os.environ if base is None else base)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if not f.startswith("--xla_force_host_platform_device_count")]
    flags.append(f"--xla_force_host_platform_device_count={local_devices}")
    for f in ("--xla_llvm_disable_expensive_passes=true",
              "--xla_cpu_collective_call_warn_stuck_timeout_seconds=20",
              "--xla_cpu_collective_call_terminate_timeout_seconds="
              f"{COLLECTIVE_TERMINATE_S}"):
        if f.split("=")[0] not in " ".join(flags):
            flags.append(f)
    env["XLA_FLAGS"] = " ".join(flags)
    return env


class WorkerFailure(RuntimeError):
    """One worker of a multi-process job exited nonzero (its siblings were
    killed immediately — a dead peer only wedges their collectives until the
    deadline, so burning the rest of the budget teaches nothing)."""

    def __init__(self, index: int, returncode: int, stdout: str, stderr: str):
        self.index = index
        self.returncode = returncode
        self.stdout = stdout
        self.stderr = stderr
        super().__init__(
            f"worker {index} exited rc={returncode}:\n{stderr[-3000:]}")


def run_workers(cmds: list, timeout: float, env: dict | None = None,
                cwd: str | None = None) -> list:
    """Run one process per argv in `cmds` under a SHARED deadline.

    Returns [(returncode, stdout, stderr)] in cmd order — all rc 0 on the
    success path.  Raises WorkerFailure (with the guilty worker's stderr) as
    soon as ANY worker exits nonzero, and subprocess.TimeoutExpired when the
    shared deadline expires.  On EVERY exit path all workers are killed and
    reaped — no strays.

    Worker output goes to temp FILES, not pipes, deliberately: on this host a
    sibling Popen holds duplicates of an earlier worker's pipe write-ends, so
    communicate() on an ALREADY-EXITED worker blocks until every later
    sibling exits (measured; a pipe-based version only works when workers
    happen to finish together).  File-backed output also removes the 64 KB
    pipe-buffer stall for chatty workers; poll() needs only waitpid, never
    pipe EOF.
    """
    import tempfile
    deadline = time.monotonic() + timeout
    procs = []
    try:
        for c in cmds:
            fo = tempfile.TemporaryFile(mode="w+")
            fe = tempfile.TemporaryFile(mode="w+")
            procs.append((subprocess.Popen(c, stdout=fo, stderr=fe,
                                           text=True, env=env, cwd=cwd),
                          fo, fe))
        while True:
            codes = [p.poll() for p, _, _ in procs]
            bad = next((i for i, c in enumerate(codes)
                        if c is not None and c != 0), None)
            if bad is not None:
                for q, _, _ in procs:
                    if q.poll() is None:
                        q.kill()
                        q.wait()
                _, fo, fe = procs[bad]
                fo.seek(0)
                fe.seek(0)
                raise WorkerFailure(bad, codes[bad], fo.read(), fe.read())
            if all(c == 0 for c in codes):
                break
            if time.monotonic() > deadline:
                raise subprocess.TimeoutExpired(cmds, timeout)
            time.sleep(0.2)
        results = []
        for p, fo, fe in procs:
            fo.seek(0)
            fe.seek(0)
            results.append((p.returncode, fo.read(), fe.read()))
        return results
    finally:
        for p, fo, fe in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
            fo.close()
            fe.close()


def python_workers(args_per_worker: list, timeout: float,
                   env: dict | None = None, cwd: str | None = None) -> list:
    """run_workers for sys.executable children (the common case)."""
    return run_workers([[sys.executable, *a] for a in args_per_worker],
                       timeout, env=env, cwd=cwd)
