"""StallWatchdog unit tests (fdt/utils/watchdog.py): the hang-recovery
half of the crash-resume story (MyTrain_repo.py:31-33 has only the crash
half — a CUDA run never hangs; a tunnel-backed TPU run does)."""
import threading
import time

from fdt.utils.watchdog import STALL_EXIT_CODE, StallWatchdog


def _recorder():
    fired = threading.Event()
    gaps = []

    def on_stall(gap):
        gaps.append(gap)
        fired.set()

    return fired, gaps, on_stall


def test_disabled_when_limit_nonpositive():
    wd = StallWatchdog(0, name="off")
    assert wd._thread is None
    wd.beat()           # harmless no-ops
    wd.close()


def test_no_fire_before_first_beat():
    """Pre-first-beat work (XLA compiles) is unbounded and must be exempt."""
    fired, _, on_stall = _recorder()
    with StallWatchdog(0.05, on_stall=on_stall, poll_s=0.01):
        assert not fired.wait(0.3)


def test_fires_on_stall_after_first_beat():
    fired, gaps, on_stall = _recorder()
    with StallWatchdog(0.05, on_stall=on_stall, poll_s=0.01) as wd:
        wd.beat()
        assert fired.wait(2.0)
    assert gaps and gaps[0] > 0.05


def test_beats_keep_it_alive():
    fired, _, on_stall = _recorder()
    with StallWatchdog(0.15, on_stall=on_stall, poll_s=0.01) as wd:
        for _ in range(10):
            wd.beat()
            time.sleep(0.03)
        assert not fired.is_set()


def test_close_stops_monitoring():
    fired, _, on_stall = _recorder()
    wd = StallWatchdog(0.05, on_stall=on_stall, poll_s=0.01)
    wd.beat()
    wd.close()
    assert not fired.wait(0.3)


def test_exit_code_is_the_chained_runner_contract():
    # scripts/train_chained.py retries a chunk exactly on this code
    assert STALL_EXIT_CODE == 86


def test_train_config_wires_stall_timeout():
    from fdt.train.driver import TrainConfig
    assert TrainConfig().stall_timeout == 0.0      # opt-in
    assert TrainConfig(stall_timeout=300.0).stall_timeout == 300.0


def test_chained_runner_retries_only_on_stall_code():
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "train_chained", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "train_chained.py"))
    tc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tc)

    calls = []

    def fake_call(rcs):
        seq = iter(rcs)
        return lambda cmd: (calls.append(list(cmd)), next(seq))[1]

    # stall twice, then succeed — three invocations of the SAME command
    calls.clear()
    rc = tc.run_chunk(["prog"], stall_retries=2, call=fake_call([86, 86, 0]))
    assert rc == 0 and len(calls) == 3 and all(c == ["prog"] for c in calls)

    # retries exhausted: the stall code propagates
    calls.clear()
    rc = tc.run_chunk(["prog"], stall_retries=1, call=fake_call([86, 86]))
    assert rc == 86 and len(calls) == 2

    # a real failure aborts immediately, no retry
    calls.clear()
    rc = tc.run_chunk(["prog"], stall_retries=2, call=fake_call([1]))
    assert rc == 1 and len(calls) == 1


def test_startup_limit_fires_before_first_beat():
    """A wedge in backend init / restore never beats — observed live: a
    chunk process hung before its tunnel connection threads even spawned."""
    fired, gaps, on_stall = _recorder()
    with StallWatchdog(10.0, on_stall=on_stall, poll_s=0.01,
                       startup_limit_s=0.05):
        assert fired.wait(2.0)
    assert gaps and gaps[0] > 0.05


def test_first_beat_disarms_startup_limit():
    fired, _, on_stall = _recorder()
    with StallWatchdog(10.0, on_stall=on_stall, poll_s=0.01,
                       startup_limit_s=0.05) as wd:
        wd.beat()
        assert not fired.wait(0.3)
