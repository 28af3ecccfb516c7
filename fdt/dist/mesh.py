"""Device mesh and sharding rules — the framework's communication backend.

The reference is single-GPU with no distributed layer (SURVEY §2.9: DataParallel
only as a comment, MyTrain_repo.py:71).  The TPU-native equivalent is data
parallelism over a 1-D `jax.sharding.Mesh`:

  * train/eval batches are sharded over the `data` axis,
  * parameters/optimizer state are replicated,
  * XLA inserts the gradient psum / metric all_gather collectives over ICI from
    the sharding annotations — no hand-written NCCL-style calls.

Multi-host deployments extend the same mesh across processes
(`jax.distributed.initialize` + per-process data slicing over DCN); see
fdt.dist.multihost for the process-level contract and tests/test_multihost.py
for a live 2-process cluster run.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over `n_devices` local devices.

    If the default backend exposes fewer devices than requested (e.g. a single
    tunneled TPU chip), fall back to the virtual-CPU backend so multi-chip
    sharding can still be exercised (xla_force_host_platform_device_count).
    """
    devices = list(jax.devices())
    if n_devices is not None and len(devices) < n_devices:
        try:
            cpu = list(jax.devices("cpu"))
        except RuntimeError:
            cpu = []
        if len(cpu) >= n_devices:
            devices = cpu
        else:
            raise ValueError(f"requested {n_devices} devices; have "
                             f"{len(devices)} default + {len(cpu)} cpu")
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis_name: str = "data"):
    """Place a host batch on the mesh, sharded along axis 0."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
