#!/usr/bin/env python
"""Pseudo-label the shipped sample images into a mini WIDER-format dataset.

The environment ships 15 sample jpgs but not the WIDER-FACE images, so
trained-weights measurements (VERDICT r2 stretch item) need labels from
somewhere.  This script labels every image by DETECTOR CONSENSUS between the
two shipped pretrained families (VERDICT r4 item 3):

  * the MTCNN cascade at native resolution proposes boxes (the only family
    whose pretrained weights localize small faces well);
  * the pretrained FaceBoxes net (1024² resize) CONFIRMS them: an MTCNN box
    is kept when a FaceBoxes detection overlaps it at IoU >= --confirm-iou,
    OR its MTCNN score is >= --solo-score (high-confidence faces FaceBoxes'
    coarser 32-px anchor floor misses — typically the smallest ones).

Cross-family agreement beats single-detector confidence as a label filter:
the two families share no weights, training data pipeline, or anchor design,
so coincident boxes are very likely real faces.

Split: --val-count images (default 6, VERDICT r4 item 3 asks >= 6), spread
deterministically over the kept list, go to the val file; the rest train.
The bench/test crowd scene (try1_thresh_0.39_13.jpg, 12 faces) sorts to a
train slot — tests/test_trained_weights.py measures detection density on it
with weights trained on this split.

Runs on the CPU backend: per-image native-resolution compiles are seconds on
CPU (vs minutes per shape over the TPU tunnel), and 15 images need no
throughput.  Pseudo-labels, not ground truth — but consensus-filtered, which
is all the downstream trained-weights drift/AP/bench measurements need: a
detector whose score distribution peaks on real face patterns instead of
random-init noise.

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
FACEBOX_PT = "/root/reference/FACEBOX/faceboxes.pt"


def _iou_xyxy(a, b):
    """[N,4] x [M,4] corner-format IoU matrix (numpy)."""
    if not len(a) or not len(b):
        return np.zeros((len(a), len(b)), np.float32)
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:4], b[None, :, 2:4])
    wh = np.clip(br - tl, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def val_indices(n: int, k: int) -> set:
    """k of n indices, deterministically spread (first/last never adjacent-
    heavy): i is val iff (i * k) % n < k — exactly k picks when k <= n."""
    return {i for i in range(n) if (i * k) % n < k}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/mini")
    ap.add_argument("--min-score", type=float, default=0.6,
                    help="MTCNN proposal floor")
    ap.add_argument("--confirm-iou", type=float, default=0.35,
                    help="FaceBoxes overlap that confirms an MTCNN box")
    ap.add_argument("--facebox-score", type=float, default=0.2,
                    help="FaceBoxes confidence floor for confirmations")
    ap.add_argument("--solo-score", type=float, default=0.95,
                    help="MTCNN score that keeps an unconfirmed box")
    ap.add_argument("--val-count", type=int, default=6,
                    help="held-out val images (>= 6 per VERDICT r4)")
    args = ap.parse_args()

    import jax
    # jax_platforms (not jax_default_device): jax.devices() would ENUMERATE
    # backends, initializing the remote accelerator plugin — a dead tunnel
    # then hangs the script before it processes a single image
    jax.config.update("jax_platforms", "cpu")
    from fdt.infer.mtcnn_device import load_device_cascade
    from fdt.models.loader import load_facebox_detector

    dev = load_device_cascade(MTCNN_P, MTCNN_P.replace("pnet", "rnet"),
                              MTCNN_P.replace("pnet", "onet"))
    fb = load_facebox_detector(FACEBOX_PT) if os.path.exists(FACEBOX_PT) \
        else None

    paths = sorted(glob.glob(SAMPLES))
    assert paths, SAMPLES
    os.makedirs(args.out, exist_ok=True)
    records = []  # (path, cells, n_confirmed, n_solo)
    for p in paths:
        im = np.asarray(Image.open(p).convert("RGB"))[..., ::-1]  # BGR like cv2
        h, w = im.shape[:2]
        boxes, _lm = dev.detect_face(im)
        props = np.asarray([b for b in (boxes if len(boxes) else [])
                            if b[4] >= args.min_score], np.float32)
        if fb is not None and len(props):
            fb_boxes, fb_scores = fb.detect(im)
            fb_boxes = np.asarray(fb_boxes, np.float32).reshape(-1, 4)
            fb_boxes = fb_boxes[np.asarray(fb_scores) >= args.facebox_score]
            iou = _iou_xyxy(props[:, :4], fb_boxes)
            confirmed = iou.max(axis=1) >= args.confirm_iou if iou.size \
                else np.zeros(len(props), bool)
        else:  # no FaceBoxes checkpoint: fall back to single-detector labels
            confirmed = np.ones(len(props), bool)
        solo = props[:, 4] >= args.solo_score
        keep = props[confirmed | solo]
        cells = []
        for x1, y1, x2, y2, s in keep:
            bx = int(round(max(x1, 0.0)))
            by = int(round(max(y1, 0.0)))
            bw = int(round(min(x2, w - 1.0))) - bx
            bh = int(round(min(y2, h - 1.0))) - by
            if bw > 0 and bh > 0:
                cells += [bx, by, bw, bh]
        n = len(cells) // 4
        if n == 0:
            print(f"skip {os.path.basename(p)}: no consensus detections")
            continue
        records.append((p, cells,
                        int(confirmed.sum()), int((solo & ~confirmed).sum())))
        print(f"{os.path.basename(p)}: {n} faces "
              f"({records[-1][2]} confirmed, {records[-1][3]} solo)"
              + (" (SATURATED)" if dev.last_saturated else ""))

    vset = val_indices(len(records), min(args.val_count, len(records)))
    lines = {"train": [], "val": []}
    for i, (p, cells, _, _) in enumerate(records):
        split = "val" if i in vset else "train"
        lines[split].append(
            f"{p} {len(cells) // 4} {' '.join(map(str, cells))}\n")
    for split, ls in lines.items():
        out = os.path.join(args.out, f"gen_anno_file_mini_{split}")
        with open(out, "w") as f:
            f.writelines(ls)
        print(f"wrote {out}: {len(ls)} images")


if __name__ == "__main__":
    main()
