#!/usr/bin/env python
"""One-command full-suite runner: core tier, then the slow tier in shards.

The suite is two-tier (tests/conftest.py): the core tier (`-m "not slow"`) is
the per-change gate (~10 min on this 1-core host), while the slow tier
(multihost process tests, reference-in-process goldens, end-to-end training
workflows, trained-weight APs) pushes a monolithic run past 40 minutes with
no intermediate signal.  This runner stages them — core first, then the slow
tier split into round-robin file shards, each under its own timeout — and
appends ONE summary line to TEST_RUNS.md, so every round can commit a
recorded full-suite result instead of a builder claim (VERDICT r4 weak
item 7).

Shards run SEQUENTIALLY: the host has one CPU core, so parallel shards would
only thrash; sharding here buys bounded timeouts and partial progress, not
wall-clock.

Usage: python scripts/run_tests.py [--shards 3] [--timeout 2400] [--skip-core]
Exit code 0 iff every stage passed.
"""
import argparse
import datetime
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_stage(name, cmd, timeout):
    t0 = time.monotonic()
    log_dir = os.path.join(ROOT, ".test_logs")
    os.makedirs(log_dir, exist_ok=True)
    log_path = os.path.join(log_dir, name.replace("#", "_") + ".log")
    try:
        r = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True,
                           timeout=timeout)
        # keep the full pytest output: a one-line "1F" summary with no
        # surviving traceback is undiagnosable after the fact
        with open(log_path, "w") as f:
            f.write(r.stdout + "\n--- stderr ---\n" + r.stderr)
        tail = (r.stdout.strip().splitlines() or [""])[-1]
        ok = r.returncode == 0
    except subprocess.TimeoutExpired as e:
        with open(log_path, "w") as f:
            f.write(str(e.stdout or "") + "\n--- stderr ---\n" + str(e.stderr or ""))
        tail, ok = f"TIMEOUT after {timeout}s", False
    secs = int(time.monotonic() - t0)
    # compress pytest's summary ("219 passed, 51 deselected in 564.03s ...")
    m = re.search(r"(\d+) passed", tail)
    passed = m.group(1) if m else "?"
    failed = re.search(r"(\d+) failed", tail)
    status = f"{passed}p" + (f"/{failed.group(1)}F" if failed else "")
    if not ok and not failed:
        status += f" [{tail[-60:]}]"
    line = f"{name}: {status} {secs}s"
    print(("PASS " if ok else "FAIL ") + line, flush=True)
    return ok, line


def slow_files():
    """Test files containing slow-marked tests (cheap static scan — a
    pytest collect subprocess would pay a full import of every module)."""
    out = []
    tdir = os.path.join(ROOT, "tests")
    for f in sorted(os.listdir(tdir)):
        if not (f.startswith("test_") and f.endswith(".py")):
            continue
        src = open(os.path.join(tdir, f)).read()
        if "pytest.mark.slow" in src:
            out.append(os.path.join("tests", f))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", type=int, default=3)
    ap.add_argument("--timeout", type=int, default=2400,
                    help="per-stage timeout (seconds)")
    ap.add_argument("--skip-core", action="store_true",
                    help="slow tier only (core already green this session)")
    args = ap.parse_args()

    results, ok_all = [], True
    if not args.skip_core:
        ok, line = run_stage(
            "core", [sys.executable, "-m", "pytest", "tests/", "-m",
                     "not slow", "-q", "--no-header", "-p", "no:cacheprovider"],
            args.timeout)
        ok_all &= ok
        results.append(line)

    files = slow_files()
    shards = [files[i::args.shards] for i in range(args.shards)]
    for i, shard in enumerate(s for s in shards if s):
        ok, line = run_stage(
            f"slow#{i + 1}", [sys.executable, "-m", "pytest", *shard, "-m",
                              "slow", "-q", "--no-header",
                              "-p", "no:cacheprovider"],
            args.timeout)
        ok_all &= ok
        results.append(line)

    stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M")
    summary = (f"- {stamp} {'GREEN' if ok_all else 'RED'} | "
               + " | ".join(results) + "\n")
    with open(os.path.join(ROOT, "TEST_RUNS.md"), "a") as f:
        f.write(summary)
    print(summary.strip(), flush=True)
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
