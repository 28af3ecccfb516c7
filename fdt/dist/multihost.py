"""Multi-process data parallelism — the framework's DCN layer.

The reference has no distributed layer at all (SURVEY §2.9: DataParallel is a
comment, MyTrain_repo.py:71).  On real TPU pods, JAX processes span hosts:
each process addresses only its local chips, one global mesh covers all of
them, every process feeds its own input shard over DCN, and XLA's collectives
ride ICI.  This module carries the process-level half of that contract; the
in-process half (mesh/shardings) lives in fdt.dist.mesh.

Typical worker:

    from fdt.dist import multihost
    multihost.initialize("host0:12355", num_processes=N, process_id=i)
    mesh = make_mesh()                      # over ALL processes' devices
    state = jax.device_put(state, replicated(mesh))   # same on every process
    lo, hi = multihost.process_batch_bounds(global_batch)
    batch = load_rows(lo, hi)               # each process loads its own slice
    batch = multihost.globalize_batch(mesh, batch)
    state, metrics = trainer.train_step(state, *batch, lr)

Verified end-to-end by tests/test_multihost.py: two processes × four virtual
CPU devices run the flagship DP train step on a global 8-way mesh (Gloo
cross-process collectives) and reproduce the single-process 8-device loss.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str, num_processes: int, process_id: int,
               **kw) -> None:
    """jax.distributed.initialize wrapper (idempotence-guarded).

    Call before any backend use.  After this, jax.devices() returns the
    GLOBAL device list (make_mesh builds pod-wide meshes unchanged) and
    jax.local_devices() the process-local one.
    """
    # NOTE: no jax.process_count() probe here — querying it would initialize
    # the (single-process) backend before jax.distributed gets the chance,
    # silently breaking the cluster.  The flag guards same-process re-entry.
    if getattr(initialize, "_done", False):
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kw)
    initialize._done = True


def process_batch_bounds(global_batch: int,
                         process_id: int | None = None,
                         process_count: int | None = None) -> tuple[int, int]:
    """[lo, hi) rows of the global batch this process loads (contiguous
    blocks, same layout as fdt.data.collector's multi-host eval slice)."""
    n = jax.process_count() if process_count is None else process_count
    i = jax.process_index() if process_id is None else process_id
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{n} processes")
    per = global_batch // n
    return i * per, (i + 1) * per


def globalize_batch(mesh: Mesh, tree, axis_name: str = "data", specs=None):
    """Process-local batch shard → global batch-sharded jax.Array tree.

    Each process passes only ITS rows (see process_batch_bounds); the result
    is a global array of global-batch size, sharded over `axis_name`.
    Single-process meshes degrade to a plain sharded device_put, so driver
    code needs no multi-process branch.

    specs: optional flat tuple of PartitionSpecs, one per leaf of `tree` (in
    tree order), overriding the default P(axis_name) — e.g.
    fdt.dist.train_batch_specs' (P("data","space"), P("data"), ...) layout for
    spatially partitioned images on a 2-D mesh.
    """
    leaves, treedef = jax.tree.flatten(tree)
    if specs is None:
        specs = (P(axis_name),) * len(leaves)
    if len(specs) != len(leaves):
        raise ValueError(f"{len(specs)} specs for {len(leaves)} batch leaves")
    shardings = [NamedSharding(mesh, s) for s in specs]
    if not shardings[0].addressable_devices:
        raise ValueError(
            "mesh contains none of this process's devices — build it over "
            "ALL processes' devices (make_mesh() after multihost.initialize); "
            f"mesh devices: {mesh.devices.ravel()[:4]}...")
    return treedef.unflatten(
        jax.make_array_from_process_local_data(s, x)
        for x, s in zip(leaves, shardings))
