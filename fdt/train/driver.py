"""End-to-end PyramidBox training driver.

Library equivalent of the MyTrain_repo.py / MyTrain_mobile.py CLI loops:
epoch-shuffled augmented batches, step-decayed SGD, loss-history dumps in the
reference 5-row layout, periodic eval-over-val-batches, step-suffixed orbax
checkpoints, optional backbone-freeze window.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, Sequence

import jax
import numpy as np

from fdt.data.widerface import WiderFaceDataset
from fdt.train.checkpoint import save_checkpoint
from fdt.train.loops import LossHistory, PyramidTrainer, pad_targets


@dataclasses.dataclass
class TrainConfig:
    """MyTrain_repo.py:28-46 argparse defaults."""
    batch_size: int = 7
    lr: float = 2e-5
    total_iters: int = 120_000
    save_point: int = 3000
    step_values: Sequence[int] = (120_000, 300_000, 100_000)
    gamma: float = 0.5
    eval_freq: int = 0           # 0 disables (MyTrain_mobile uses 500)
    eval_batches: int = 50
    train_pretrain: int = 0      # freeze backbone before this iter (mobile)
    max_gt: int | None = None    # GT pad bucket override
    start_iter: int = 0
    name: str = "Res50_pyramid"
    save_folder: str = "weights_of_mine/"
    stall_timeout: float = 0.0   # >0: hard-exit STALL_EXIT_CODE when a step
                                 # wedges this long (fdt.utils.watchdog);
                                 # first step (compiles) is exempt
    startup_timeout: float = 0.0  # >0: same, for a wedge BEFORE the first
                                  # synced step (backend init / restore /
                                  # compiles) — budget several × stall_timeout


def prefetch_batches(dataset, batch_size: int, depth: int = 3):
    """Endless epoch-shuffled batches, built on a background thread.

    The augmentation pipeline (photometric distort + data-anchor crop) is
    host cv2/numpy work; running it on a worker thread overlaps it with the
    device train step instead of serializing host and TPU.  `depth` bounds
    the queue so a slow device doesn't pile up batches.  Worker exceptions
    (missing image, bad record) re-raise in the consumer — a dead worker must
    abort the run, not hang it.

    Closing the generator (`.close()`, garbage collection, or the consumer
    loop ending via GeneratorExit) stops the worker thread: without that, a
    daemon worker blocked in q.put would outlive the training run, pinning
    the dataset plus `depth` augmented batches for the rest of the process."""
    import queue
    import threading

    if len(dataset) < batch_size:
        raise ValueError(f"dataset has {len(dataset)} records < batch_size "
                         f"{batch_size}; no full batch can be built")
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def worker():
        try:
            while not stop.is_set():
                for images, targets in dataset.batches(batch_size):
                    # ship the batch half-precision: the host↔device link is
                    # the train step's bound here (~25 MB/s tunnel; a f32
                    # 8×640² batch is ~39 MB ≈ 1.6 s/step), and the images
                    # are integer pixel values ± channel mean, which f16
                    # carries within 0.125 ulp.  The jitted steps cast back
                    # to f32 on device (loops.py / net2net.py).
                    item = (images.astype(np.float16), targets)
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.2)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
        except BaseException as e:  # noqa: BLE001 — relayed to the consumer
            q.put(e)

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            item = q.get()
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


def run_pyramid_training(trainer: PyramidTrainer, state, train_anno: str,
                         cfg: TrainConfig, val_anno: str | None = None,
                         log: Callable[[str], None] = print, mesh=None):
    """Returns the final TrainState; checkpoints + loss .npy on save points.

    mesh: optional jax.sharding.Mesh for data-parallel training.  The state
    is replicated onto it and every batch is sharded over the mesh's `data`
    axis.  Under a multi-process cluster (fdt.dist.multihost.initialize) the
    mesh spans ALL processes' devices: each process loads a disjoint record
    shard and contributes cfg.batch_size rows, so the global batch is
    process_count × batch_size; loss `.npy` sidecars are written by process 0
    (orbax checkpoint saves run on every process — orbax coordinates the
    single write itself).
    """
    dataset = WiderFaceDataset(train_anno, size=trainer.input_size)
    val_dataset = (WiderFaceDataset(val_anno, size=trainer.input_size)
                   if val_anno else None)
    if mesh is not None:
        from fdt.dist import replicated
        state = jax.device_put(state, replicated(mesh))
        if jax.process_count() > 1:
            if cfg.max_gt is None:
                raise ValueError(
                    "multi-process training requires cfg.max_gt: per-process "
                    "GT pads must agree for the global batch to assemble")
            i, n = jax.process_index(), jax.process_count()
            # disjoint record shard + process-specific shuffle stream
            dataset.records = dataset.records[i::n]
            dataset.rng = np.random.RandomState(1 + i)
    history = LossHistory(cfg.save_point)
    eval_losses: list[float] = []

    batches = prefetch_batches(dataset, cfg.batch_size)
    try:
        return _training_loop(trainer, state, batches, cfg, val_dataset,
                              history, eval_losses, log, mesh)
    finally:
        batches.close()  # stop the prefetch worker (see prefetch_batches)


def _training_loop(trainer, state, batches, cfg, val_dataset, history,
                   eval_losses, log, mesh=None):
    from fdt.utils.watchdog import StallWatchdog
    with StallWatchdog(cfg.stall_timeout, name=cfg.name,
                       startup_limit_s=cfg.startup_timeout) as watchdog:
        return _training_loop_inner(trainer, state, batches, cfg, val_dataset,
                                    history, eval_losses, log, mesh, watchdog)


def _training_loop_inner(trainer, state, batches, cfg, val_dataset, history,
                         eval_losses, log, mesh, watchdog):
    if mesh is not None:
        from fdt.dist import multihost, train_batch_specs
        # (images, gt_boxes, gt_labels, gt_valid): images shard over
        # (data[, space→H]) — a 2-D data×space mesh spatially partitions the
        # convolutions — targets over data only
        specs = train_batch_specs(mesh, n_targets=3)
        place = lambda tree: multihost.globalize_batch(mesh, tree, specs=specs)
    else:
        place = lambda tree: tree
    # host-side sidecar writes happen once per cluster; orbax checkpoint
    # saves are collective (every process calls, orbax writes once)
    is_main = jax.process_index() == 0
    step_index = 0
    lr = cfg.lr
    for iteration in range(cfg.start_iter + 1, cfg.total_iters + 1):
        t0 = time.time()
        images, targets = next(batches)
        if iteration in cfg.step_values:
            step_index += 1
            lr = cfg.lr * (cfg.gamma ** step_index)
            log(f"adjusting lr to {lr}")

        gt_boxes, gt_labels, gt_valid = pad_targets(targets, cfg.max_gt)
        images, gt_boxes, gt_labels, gt_valid = place(
            (images, gt_boxes, gt_labels, gt_valid))
        state, metrics = trainer.train_step(
            state, images, gt_boxes, gt_labels, gt_valid, lr,
            freeze=iteration < cfg.train_pretrain)
        history.append(metrics)

        if iteration % 20 == 0:
            # the float() pulls are the loop's only per-step device syncs
            # (history.append is deliberately async) — a heartbeat here means
            # the last ~20 steps actually LANDED, so a wedged execution stops
            # the beats and the watchdog fires
            log(f"iter {iteration} || loss {float(metrics['loss']):.4f} || "
                f"loc {float(metrics['face_loc']):.4f} conf {float(metrics['face_conf']):.4f} || "
                f"lr {lr} || {time.time() - t0:.2f}s")
            watchdog.beat()

        if cfg.eval_freq and (iteration % cfg.eval_freq == 0 or iteration == 1) \
                and val_dataset is not None:
            loss_val, n = 0.0, 0
            # val_dataset is NOT process-sharded: every process walks the
            # same batches, so the globalized eval batch holds process_count
            # copies of the same rows — the mean loss is unchanged and all
            # processes execute the same program
            for img_e, tgt_e in val_dataset.batches(cfg.batch_size):
                n += 1
                gb, gl, gv = pad_targets(tgt_e, cfg.max_gt)
                img_e, gb, gl, gv = place((img_e, gb, gl, gv))
                loss_val += float(trainer.eval_loss(state, img_e, gb, gl, gv))
                watchdog.beat()
                if n > cfg.eval_batches:
                    break
            eval_losses.append(loss_val / max(n, 1))
            log(f"eval loss = {eval_losses[-1]:.5f}")

        if iteration % cfg.save_point == 0:
            path = save_checkpoint(state, cfg.save_folder, cfg.name, iteration)
            if is_main:
                history.save(f"{cfg.save_folder}/{cfg.name}_loss_{iteration}.npy")
                if eval_losses:
                    np.save(f"{cfg.save_folder}/{cfg.name}_eval_loss_{iteration}.npy",
                            np.array(eval_losses))
                    eval_losses = []
            else:
                history.reset()
                eval_losses = []
            log(f"saved {path}")

    save_checkpoint(state, cfg.save_folder, cfg.name, cfg.total_iters)
    return state
