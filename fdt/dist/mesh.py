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


def _pick_devices(n_devices: int | None):
    """Default-backend devices, falling back to the virtual-CPU backend when
    fewer than `n_devices` exist (e.g. a single tunneled TPU chip vs an
    xla_force_host_platform_device_count mesh)."""
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
    return devices


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over `n_devices` local devices."""
    return Mesh(np.asarray(_pick_devices(n_devices)), (axis_name,))


def make_mesh_2d(n_data: int, n_space: int,
                 axis_names: tuple[str, str] = ("data", "space")) -> Mesh:
    """2-D (data × space) mesh for combined data + spatial parallelism.

    `space` shards the image HEIGHT axis: the SPMD partitioner splits every
    convolution's spatial extent across the axis and inserts the halo
    exchanges itself — the vision analog of sequence parallelism (there is no
    sequence axis in this workload, SURVEY §5; the "long axes" are spatial).
    Use when one batch element's activations exceed a chip's HBM (large
    inputs / small batches); plain DP (make_mesh) is the default otherwise.
    """
    devices = _pick_devices(n_data * n_space)
    return Mesh(np.asarray(devices).reshape(n_data, n_space), axis_names)


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis_name: str = "data"):
    """Place a host batch on the mesh, sharded along axis 0."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def train_batch_specs(mesh: Mesh, n_targets: int = 3):
    """PartitionSpecs for one (images, *targets) train batch on `mesh`.

    Images shard over (data[, space→H]); target tensors (GT boxes / labels /
    valid masks) are small and shard over data only.  Works for both the 1-D
    DP mesh and the 2-D data×space mesh, so driver code needs no branch.
    """
    img = P(*mesh.axis_names[:2]) if "space" in mesh.axis_names else P("data")
    return (img,) + (P("data"),) * n_targets


def shard_train_batch(mesh: Mesh, batch):
    """Place an (images, *targets) batch per train_batch_specs."""
    specs = train_batch_specs(mesh, len(batch) - 1)
    return tuple(jax.device_put(x, NamedSharding(mesh, s))
                 for x, s in zip(batch, specs))
