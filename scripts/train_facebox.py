#!/usr/bin/env python
"""Train FaceBoxes on WIDER-FACE (new capability — the reference only ships a
pretrained faceboxes.pt, README.md:31, and its train-time encoder is dead
code, FACEBOX/encoderl.py:196-200).

Example:
  python scripts/train_facebox.py --batch_size 16 --lr 1e-3 \
      --annoPath ./image_and_anno/anno/gen_anno_file_train
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import os

import jax
import numpy as np

from fdt.config import FACEBOX
from fdt.data.widerface import WiderFaceDataset
from fdt.train.checkpoint import latest_checkpoint, restore_checkpoint, save_checkpoint
from fdt.train.facebox_train import FaceBoxTrainer
from fdt.train.loops import pad_targets


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", default=16, type=int)
    ap.add_argument("--lr", default=1e-3, type=float)
    ap.add_argument("--momentum", default=0.9, type=float)
    ap.add_argument("--weight_decay", default=5e-4, type=float)
    ap.add_argument("--iter", default=120000, type=int)
    ap.add_argument("--save_point", default=3000, type=int)
    ap.add_argument("--resume", action="store_true",
                    help="resume from the latest checkpoint in save_folder")
    ap.add_argument("--annoPath", default="./image_and_anno/anno/gen_anno_file_train")
    ap.add_argument("--save_folder", default="weights_of_mine/")
    args = ap.parse_args()
    # persistent XLA cache for the TPU backend (multi-minute compiles
    # on this host; no-op on CPU — fdt.utils.cache)
    from fdt.utils.cache import enable_tpu_compile_cache
    enable_tpu_compile_cache()

    trainer = FaceBoxTrainer(momentum=args.momentum,
                             weight_decay=args.weight_decay)
    state = trainer.init_state(jax.random.PRNGKey(0))
    if args.resume:
        path = latest_checkpoint(args.save_folder, "facebox")
        if path:
            state = restore_checkpoint(path, state)
            print(f"resumed from {path}")

    # raw-pixel augmentation (mean=(0,0,0)): FaceBoxes' protocol is /255 on
    # raw pixels (applied inside FaceBoxTrainer._losses, matching
    # My_test_facebox.py:15 at inference) — the pyramid family's
    # mean-subtracted output would train on a shifted input distribution
    import functools

    from fdt.data.augment import pyramid_augment
    dataset = WiderFaceDataset(
        args.annoPath, size=FACEBOX.input_size,
        augment=functools.partial(pyramid_augment, mean=(0, 0, 0)))
    os.makedirs(args.save_folder, exist_ok=True)
    it = int(np.asarray(state.step))
    while it < args.iter:
        for images, targets in dataset.batches(args.batch_size):
            gt_boxes, gt_labels, gt_valid = pad_targets(targets)
            # FaceBoxes labels faces as class 1 (encoderl.py:158-215), unlike
            # the pyramid family's 0-based face label in the anno rows
            gt_labels = gt_valid.astype(np.int32)
            state, metrics = trainer.train_step(state, images, gt_boxes,
                                                gt_labels, gt_valid, args.lr)
            it += 1
            if it % 10 == 0:
                print(f"iter {it}: loss {float(metrics['loss']):.4f} "
                      f"(loc {float(metrics['loc']):.4f} conf {float(metrics['conf']):.4f})")
            if it % args.save_point == 0 or it >= args.iter:
                save_checkpoint(state, args.save_folder, "facebox", it)
            if it >= args.iter:
                break


if __name__ == "__main__":
    main()
