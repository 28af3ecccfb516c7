#!/usr/bin/env python
"""Pseudo-label the shipped sample images into a mini WIDER-format dataset.

The environment ships the 15 sample jpgs but not the WIDER-FACE images, so
trained-weights measurements (VERDICT r2 stretch item) need labels from
somewhere: this script runs the pretrained MTCNN cascade (the only shipped
trained detector family) over the sample images at NATIVE resolution and
writes its detections as a `gen_anno_file`-format mini dataset
(fdt/data/anno.py parsing; reference format gen_anno.py:13-38).

Runs on the CPU backend: per-image native-resolution compiles are seconds on
CPU (vs minutes per shape over the TPU tunnel), and 15 images need no
throughput.  Pseudo-labels, not ground truth — the pretrained cascade finds
the 1–12 larger faces per scene (min_face 12), which is all the downstream
trained-weights drift/bench measurements need: a detector whose score
distribution peaks on real face patterns instead of random-init noise.

Usage: python scripts/make_mini_anno.py [--out data/mini] [--min-score 0.6]
"""
import argparse
import glob
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SAMPLES = "/root/reference/image_and_anno/test_image/try1/*.jpg"
MTCNN_P = "/root/reference/MTCNN/original_model/pnet_epoch.pt"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/mini")
    ap.add_argument("--min-score", type=float, default=0.6)
    ap.add_argument("--val-every", type=int, default=5,
                    help="every k-th image goes to the val split")
    args = ap.parse_args()

    import jax
    # jax_platforms (not jax_default_device): jax.devices() would ENUMERATE
    # backends, initializing the remote accelerator plugin — a dead tunnel
    # then hangs the script before it processes a single image
    jax.config.update("jax_platforms", "cpu")
    from fdt.infer.mtcnn_device import load_device_cascade

    dev = load_device_cascade(MTCNN_P, MTCNN_P.replace("pnet", "rnet"),
                              MTCNN_P.replace("pnet", "onet"))

    paths = sorted(glob.glob(SAMPLES))
    assert paths, SAMPLES
    os.makedirs(args.out, exist_ok=True)
    lines = {"train": [], "val": []}
    kept = 0
    for i, p in enumerate(paths):
        im = np.asarray(Image.open(p).convert("RGB"))[..., ::-1]  # BGR like cv2
        h, w = im.shape[:2]
        boxes, _lm = dev.detect_face(im)
        cells = []
        for x1, y1, x2, y2, s in (boxes if len(boxes) else []):
            if s < args.min_score:
                continue
            bx = int(round(max(x1, 0.0)))
            by = int(round(max(y1, 0.0)))
            bw = int(round(min(x2, w - 1.0))) - bx
            bh = int(round(min(y2, h - 1.0))) - by
            if bw > 0 and bh > 0:
                cells += [bx, by, bw, bh]
        n = len(cells) // 4
        if n == 0:
            print(f"skip {os.path.basename(p)}: no confident detections")
            continue
        split = "val" if (kept % args.val_every == args.val_every - 1) else "train"
        kept += 1
        lines[split].append(f"{p} {n} {' '.join(map(str, cells))}\n")
        print(f"{os.path.basename(p)} [{split}]: {n} faces"
              + (" (SATURATED)" if dev.last_saturated else ""))

    for split, ls in lines.items():
        out = os.path.join(args.out, f"gen_anno_file_mini_{split}")
        with open(out, "w") as f:
            f.writelines(ls)
        print(f"wrote {out}: {len(ls)} images")


if __name__ == "__main__":
    main()
