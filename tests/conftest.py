"""Test configuration.

Runs the whole suite on a virtual 8-device CPU platform so multi-chip sharding
paths compile and execute without TPU hardware (the idiomatic JAX stand-in for
"multi-node without a cluster").  Must set XLA flags before jax is imported.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import pathlib
import sys

import numpy as np
import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

# Some environments ship accelerator plugins that ignore the JAX_PLATFORMS
# env var (jax is pre-imported at interpreter start, so env vars set above
# are never read) and claim the default backend (e.g. the tunneled single-TPU
# 'axon' platform).  Worse, merely ENUMERATING backends (jax.devices) blocks
# on the plugin's remote handshake — a dead tunnel hangs the whole suite at
# collection.  jax.config.update("jax_platforms", ...) DOES take effect
# post-import as long as no backend has initialized yet: pin CPU so the
# accelerator plugin never initializes and the suite is hermetic to tunnel
# state entirely (same hermeticity fix as __graft_entry__.dryrun_multichip).
import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:  # pragma: no cover
    pass

# NOTE: no persistent compilation cache for the (CPU-backend) test suite.
# Env-var cache config never took effect here anyway (this environment
# pre-imports jax at interpreter start, so JAX_COMPILATION_CACHE_DIR set in
# this file is never read), and enabling it via jax.config.update is actively
# harmful on this machine: reloading XLA:CPU AOT executables trips a
# CPU-feature mismatch ("+prefer-no-gather ... SIGILL") that can hang tests.

REFERENCE_ROOT = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_root():
    if not REFERENCE_ROOT.exists():
        pytest.skip("reference repo not available")
    return REFERENCE_ROOT


def import_reference(module: str):
    """Import a module from the reference repo with CPU/py3.12 compat stubs:
    torchvision (absent from this image; only imported, barely used), time.clock
    (removed in py3.8), and Tensor.cuda (no CUDA in the oracle environment)."""
    import importlib
    import time
    import types
    if not REFERENCE_ROOT.exists():
        pytest.skip("reference repo not available")
    torch = pytest.importorskip("torch")
    time.clock = time.time
    torch.Tensor.cuda = lambda self, *a, **k: self
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tfm = types.ModuleType("torchvision.transforms")

        class _ToTensor:
            def __call__(self, pic):
                arr = np.asarray(pic).astype(np.float32) / 255.0
                return torch.from_numpy(arr.transpose(2, 0, 1))

        tfm.ToTensor = _ToTensor
        tv.transforms = tfm
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tfm
    sys.path.insert(0, str(REFERENCE_ROOT))
    try:
        return importlib.import_module(module)
    finally:
        sys.path.pop(0)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "watchdog(seconds): override the per-test hang-watchdog budget "
        "(default 900s; multi-process cluster tests compile two XLA programs "
        "concurrently on this 1-core host and legitimately need more)")


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_call(item):
    """Per-test hang watchdog: this machine's XLA:CPU occasionally deadlocks
    (idle rendezvous wait); after the budget a single test dumps every
    thread's stack and aborts, turning a silent eternal hang into a
    diagnosable failure.  The slowest legitimate single-process test is
    ~5 min under load; @pytest.mark.watchdog(n) raises the budget for the
    known-long multi-process tests."""
    import faulthandler
    marker = item.get_closest_marker("watchdog")
    budget = int(marker.args[0]) if marker else 900
    faulthandler.dump_traceback_later(budget, exit=True,
                                      file=_watchdog_stderr())
    try:
        yield
    finally:
        faulthandler.cancel_dump_traceback_later()


_WATCHDOG_STDERR = None


def _watchdog_stderr():
    """A stable dump sink for the watchdog.  pytest's fd-level capture
    redirects fd 2 to per-test temp files, so dumping to sys.stderr sends the
    tracebacks into a temp that vanishes and the process dies silently
    (observed: a contended run ended mid-suite with no summary and no dump).
    Dump to a fixed file instead; its path is printed so the abort is
    diagnosable."""
    global _WATCHDOG_STDERR
    if _WATCHDOG_STDERR is None:
        import os
        path = os.environ.get("FDT_WATCHDOG_LOG", "/tmp/fdt_watchdog_dump.log")
        _WATCHDOG_STDERR = open(path, "a", buffering=1)
        print(f"[conftest] watchdog aborts dump to {path}")
    return _WATCHDOG_STDERR
