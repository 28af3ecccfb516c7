"""Worker for tests/test_multihost.py — one process of an N-process DP job.

Runs the flagship PyramidBox DP train step on a global 8-device mesh and
prints one JSON line {"pid": i, "loss": ...}.  With n=1 it is a plain
single-process 8-virtual-device run (the parity reference); with n>1 each
process owns 8/n virtual CPU devices and feeds its own contiguous global-batch
slice, exactly the multi-host pod contract (fdt/dist/multihost.py).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Hermetic to accelerator/tunnel state: first jax-touching statement (env vars
# are never read here — jax is pre-imported at interpreter start).
jax.config.update("jax_platforms", "cpu")


def main(pid: int, n: int, port: int) -> None:
    from fdt.dist import make_mesh, multihost, replicated

    if n > 1:
        multihost.initialize(f"127.0.0.1:{port}", num_processes=n,
                             process_id=pid)
    import numpy as np

    from fdt.models.pyramidbox import PyramidBox
    from fdt.train import PyramidTrainer, pad_targets

    mesh = make_mesh(8)
    trainer = PyramidTrainer(PyramidBox(), "repo", input_size=128)
    # deterministic across processes (crc32 path digests): every process
    # materializes the SAME initial state, the multi-host replication contract
    state = trainer.init_state(jax.random.PRNGKey(0), abstract=True)
    state = jax.device_put(state, replicated(mesh))

    rng = np.random.RandomState(0)
    images = rng.rand(8, 128, 128, 3).astype(np.float32) * 255.0
    targets = [np.array([[0.1, 0.1, 0.4, 0.4, 0.0],
                         [0.5, 0.5, 0.9, 0.9, 0.0]], np.float32)
               for _ in range(8)]
    gt_boxes, gt_labels, gt_valid = pad_targets(targets, max_gt=8)

    lo, hi = multihost.process_batch_bounds(8, process_id=pid,
                                            process_count=n)
    local = tuple(a[lo:hi] for a in (images, gt_boxes, gt_labels, gt_valid))
    batch = multihost.globalize_batch(mesh, local)

    state, metrics = trainer.train_step(state, *batch, 1e-4)
    loss = float(jax.block_until_ready(metrics["loss"]))
    print(json.dumps({"pid": pid, "loss": loss}), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
