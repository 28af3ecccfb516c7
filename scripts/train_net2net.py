#!/usr/bin/env python
"""Net2net distillation (reference train_net2net/Train_net2net_linux.py CLI)."""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import time

import jax
import numpy as np

from fdt.data.widerface import WiderFaceDataset
from fdt.models.loader import load_variables
from fdt.models.pyramidbox_mobile import build_pyramidbox
from fdt.train.checkpoint import save_checkpoint
from fdt.train.net2net import Net2NetTrainer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", default="intermedia",
                    choices=["intermedia", "source", "overall"])
    ap.add_argument("--student", default="try1", choices=["try1", "try2"])
    ap.add_argument("--teacher_weights", default="./net_weight/Res50_pyramid.pth")
    ap.add_argument("--batch_size", default=8, type=int)
    ap.add_argument("--lr", default=1e-3, type=float)
    ap.add_argument("--iter", default=500000, type=int)
    ap.add_argument("--save_point", default=2000, type=int)
    ap.add_argument("--start_iter", default=0, type=int,
                    help="resume iteration count (pairs with --resume: the "
                         "same chained-process restart contract as "
                         "train_pyramid.py — long runs over the tunnel "
                         "leak host RSS with uploaded bytes, so bound each "
                         "process's lifetime and chain through checkpoints)")
    ap.add_argument("--resume", default=None,
                    help="orbax TrainState dir from a previous save_point")
    ap.add_argument("--momentum", default=0.5, type=float)
    ap.add_argument("--stall_timeout", default=0, type=float,
                    help="seconds without synced step progress before "
                         "hard-exit 86 (lost tunnel execution; see "
                         "fdt.utils.watchdog); 0 disables")
    ap.add_argument("--startup_timeout", default=0, type=float,
                    help="like --stall_timeout but for a wedge before the "
                         "first step (init/restore/compile)")
    ap.add_argument("--annoPath", default="./image_and_anno/anno/gen_anno_file_train")
    ap.add_argument("--save_folder", default="weights_of_mine/")
    args = ap.parse_args()
    # persistent XLA cache for the TPU backend (multi-minute compiles
    # on this host; no-op on CPU — fdt.utils.cache)
    from fdt.utils.cache import enable_tpu_compile_cache
    enable_tpu_compile_cache()

    teacher = build_pyramidbox("repo")
    student = build_pyramidbox(args.student)
    trainer = Net2NetTrainer(student, teacher, args.train,
                             momentum=args.momentum)
    teacher_vars = load_variables(teacher.clone(return_features=True),
                                  args.teacher_weights, 640)
    state = trainer.init_state(jax.random.PRNGKey(0), teacher_vars)
    if args.resume:
        from fdt.train.checkpoint import restore_checkpoint
        state = restore_checkpoint(args.resume, state)

    dataset = WiderFaceDataset(args.annoPath, size=640)
    # background-thread augmentation like the main training driver — the
    # distill step is device-bound, the aug pipeline is host cv2/numpy work
    from fdt.train.driver import prefetch_batches
    from fdt.utils.watchdog import StallWatchdog
    batches = prefetch_batches(dataset, args.batch_size)
    loss_save = np.zeros(args.save_point + 1)
    idx = 0
    try:
        with StallWatchdog(args.stall_timeout, name=f"n2n_{args.train}",
                           startup_limit_s=args.startup_timeout) as watchdog:
            for it in range(args.start_iter + 1, args.iter + 1):
                images, _ = next(batches)
                t0 = time.time()
                state, metrics = trainer.train_step(state, images, args.lr)
                loss_save[idx] = float(metrics["loss"])  # syncs the step
                watchdog.beat()
                idx += 1
                if it % 20 == 0:
                    print(f"iter {it} || loss {float(metrics['loss']):.4f} "
                          f"|| parts {np.asarray(metrics['parts']).round(4)} "
                          f"|| {time.time() - t0:.2f}s", flush=True)
                if it % args.save_point == 0:
                    save_checkpoint(state, args.save_folder,
                                    f"{args.train}_net", it)
                    np.save(f"{args.save_folder}/{args.train}_loss_{it}.npy",
                            loss_save)
                    loss_save = np.zeros(args.save_point + 1)
                    idx = 0
    finally:
        batches.close()  # stop the prefetch worker thread
    if args.iter % args.save_point != 0:
        save_checkpoint(state, args.save_folder, f"{args.train}_net_final",
                        args.iter)


if __name__ == "__main__":
    main()
