"""True multi-process data parallelism (fdt/dist/multihost.py).

The reference is single-GPU (SURVEY §2.9); on TPU pods the same model spans
processes.  This test runs the REAL flagship DP train step three ways on
8 virtual CPU devices — single process, and 2 processes × 4 devices with
Gloo cross-process collectives — and requires the losses to agree: the
multi-host contract (deterministic per-process init, per-process input
slices, global mesh) reproduces the single-process result.

Each worker is a child process (tests/multihost_worker.py) so the suite's
own backend state never leaks in; the known XLA:CPU collective-rendezvous
flake is handled by collective terminate timeouts + one retry.
"""
import json
import os
import subprocess

import numpy as np
import pytest

from fdt.dist.procutil import (WorkerFailure, child_env, free_port,
                               python_workers)

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _run_job(n_procs: int, timeout: float = 600.0) -> list:
    """Launch the n-process job once → list of per-process losses.

    `timeout` is a SHARED deadline for the whole job, not per worker — the
    per-test hang watchdog budgets the test as a whole, so one slow worker
    must not be granted a fresh full timeout after another already spent it.
    """
    port = free_port()
    results = python_workers(
        [[_WORKER, str(i), str(n_procs), str(port)] for i in range(n_procs)],
        timeout, env=child_env(8 // n_procs))
    outs = [json.loads(out.strip().splitlines()[-1]) for _, out, _ in results]
    return [o["loss"] for o in sorted(outs, key=lambda o: o["pid"])]


def _run_job_retry(n_procs: int) -> list:
    try:
        return _run_job(n_procs)
    except (WorkerFailure, subprocess.TimeoutExpired):
        # one retry: XLA:CPU collectives can nondeterministically deadlock on
        # this 1-core host (see __graft_entry__.dryrun_multichip); the
        # terminate timeouts turn that into a fast failure worth one re-run
        return _run_job(n_procs)


@pytest.mark.slow
@pytest.mark.watchdog(3000)
def test_two_process_dp_matches_single_process():
    # watchdog(3000): true worst case is 4 jobs (single + retry, multi +
    # retry) at the 600s shared deadline each = 2400s of job time, plus
    # spawn/compile overhead headroom — each pair compiles two XLA programs
    # concurrently on ONE core; the 900s default killed the whole suite
    # mid-run here (observed)
    single = _run_job_retry(1)
    multi = _run_job_retry(2)
    assert np.isfinite(single[0])
    # both processes observe the same global loss, equal to the 1-process run
    assert multi[0] == multi[1]
    assert abs(multi[0] - single[0]) <= 1e-5 * abs(single[0])


_MINI_TRAIN = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "mini", "gen_anno_file_mini_train")


@pytest.mark.slow
@pytest.mark.watchdog(2400)
@pytest.mark.skipif(not os.path.exists(_MINI_TRAIN),
                    reason="mini dataset not generated")
def test_two_process_training_cli(tmp_path):
    """scripts/train_pyramid.py --num_processes 2: the full driver loop
    (disjoint record shards, globalized batches, collective orbax save,
    process-0 loss sidecar) through the real CLI front door."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(repo, "scripts", "train_pyramid.py")
    env = child_env(local_devices=2)  # 2 procs x 2 devices = 4-way global mesh

    def run_once():
        # fresh port per attempt: a killed worker from a failed attempt must
        # not be able to join the retry cluster as a duplicate process_id
        port = free_port()
        cmd = [script, "--net", "try3", "--platform", "cpu",
               "--input_size", "128", "--batch_size", "2", "--iter", "4",
               "--save_point", "4", "--max_gt", "8", "--lr", "1e-4",
               "--num_processes", "2", "--coordinator", f"127.0.0.1:{port}",
               "--annoPath", _MINI_TRAIN, "--save_folder", str(tmp_path) + "/"]
        # shared 700s deadline for the whole 2-worker job (2 attempts fit the
        # 2400s watchdog with headroom; per-worker timeouts would not)
        python_workers([cmd + ["--process_id", str(i)] for i in range(2)],
                       timeout=700, env=env, cwd=repo)

    try:
        run_once()
    except (WorkerFailure, subprocess.TimeoutExpired):
        run_once()  # one retry — the known XLA:CPU collective flake
    # one checkpoint, written once (orbax coordinates), plus process-0 sidecar
    assert os.path.isdir(tmp_path / "try3_pyramid_4")
    assert (tmp_path / "try3_pyramid_loss_4.npy").exists()
    loss = np.load(tmp_path / "try3_pyramid_loss_4.npy")
    assert loss.shape[0] == 5 and np.isfinite(loss[0, :4]).all()
    assert loss[0, :4].max() > 0
