"""Size-bucketed batched evaluation — the TPU throughput path for WIDER val.

The reference evaluates one image at a time at native resolution
(My_test.py:140-165), which on TPU wastes the chip between images and
recompiles per resolution.  This driver:

  1. groups eval images into (W, H) buckets (WIDER val is mostly 1024×·, so a
     handful of buckets covers the set; rare sizes fall back to per-image),
  2. right/bottom mean-pads each image to its bucket (priors are built for the
     PADDED size, so decoded coordinates stay in true pixel space — padded
     regions only ever produce extra background candidates past the GT area),
  3. runs the jitted batched detector per bucket and walks rows on host.

Padding changes border conv context, so scores differ slightly from the
native-resolution protocol near the pad seam: this is the *throughput* mode;
bit-faithful parity eval stays in fdt.eval.runner.

Measured seam cost (tests/test_batched_eval_seam.py, 2026-08): an image
already at its bucket size is BIT-IDENTICAL to the native path; a padded image
under untrained try3 weights (pessimistic — outputs are noise) kept 85% of
rows matched at IoU>0.5 with max matched score delta 0.076 and a row-count
delta of 1/393.  With TRAINED weights (net_weight/try3_mini.npz,
tests/test_trained_weights.py) the drift all but vanishes: row counts equal,
100% matched, min matched IoU 0.987, max score delta 0.0039.
"""
from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Tuple

import numpy as np

from fdt.config import PIXEL_MEAN_BGR
from fdt.data.collector import EvalCollector
from fdt.eval.pr import TfConfAccumulator
from fdt.infer.pyramidbox import detections_to_rows


def bucket_for(w: int, h: int, multiple: int = 128) -> Tuple[int, int]:
    up = lambda v: ((v + multiple - 1) // multiple) * multiple
    return up(w), up(h)


def eval_pyramidbox_batched(detector, anno_file: str, threshold: float,
                            batch_size: int = 8, dump_path: str = "",
                            iou_thresh: float = 0.5,
                            progress: bool = True) -> np.ndarray:
    """Bucketed-batched PyramidBox eval; returns the reference-layout dump."""
    dataset = EvalCollector(anno_file)
    buckets: Dict[Tuple[int, int], List[int]] = defaultdict(list)
    import cv2

    def image_size(path):
        """(w, h) from the file header — the bucketing pass must not decode
        every JPEG a second time just to learn its shape."""
        try:
            from PIL import Image
            with Image.open(path) as im:
                return im.size
        except Exception:
            img = cv2.imread(path)
            if img is None:
                raise FileNotFoundError(path)
            return img.shape[1], img.shape[0]

    for i, rec in enumerate(dataset.records):
        w, h = image_size(rec.path)
        buckets[bucket_for(w, h)].append(i)

    acc = TfConfAccumulator(iou_thresh)
    mean = np.array(PIXEL_MEAN_BGR, np.float32).astype(np.uint8)
    done = 0
    for (bw, bh), idxs in buckets.items():
        for s in range(0, len(idxs), batch_size):
            chunk = idxs[s:s + batch_size]
            batch = np.zeros((len(chunk), bh, bw, 3), np.uint8)
            wh = []
            for j, i in enumerate(chunk):
                img = cv2.imread(dataset.records[i].path)
                h, w, _ = img.shape
                batch[j, :, :] = mean  # pad region ≈ zero after mean-subtract
                batch[j, :h, :w] = img
                wh.append((w, h))
            det = detector.detect_tensor(batch, conf_thresh=threshold,
                                         nms_thresh=0.35)
            for j, i in enumerate(chunk):
                # priors are normalized by the PADDED size → scale by it
                rows = detections_to_rows(det[j], threshold, [bw, bh, bw, bh])
                acc.add(rows, dataset.records[i].boxes_xywh)
                done += 1
            if progress:
                print(f"bucket {bw}x{bh}: {done} images done")
    dump = acc.finalize()
    if dump_path:
        np.save(dump_path, dump)
    return dump
