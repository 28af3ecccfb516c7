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

REFERENCE_ROOT = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_root():
    if not REFERENCE_ROOT.exists():
        pytest.skip("reference repo not available")
    return REFERENCE_ROOT


@pytest.fixture
def rng():
    return np.random.RandomState(0)
