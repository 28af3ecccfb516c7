#!/usr/bin/env python
"""Score trained checkpoints by held-out mini-val AP and pick the best.

Checkpoint selection for the mini-dataset training runs (the reference picks
checkpoints by eyeballing loss curves + the eval-during-train loss,
MyTrain_mobile.py:211-230; with a 6-image val split the direct AP is just as
cheap and is the quantity the trained-weights tests pin).  All checkpoints
share ONE compiled detect graph — the jitted run() takes variables as an
argument, so sweeping N checkpoints costs one compile + N×6 tiny forwards —
which makes this practical on the TPU backend (persistent compile cache)
between training runs.

Usage:
  python scripts/select_checkpoint.py --net repo \
      --checkpoints 'weights_of_mine/repo_r5/repo_pyramid_*'
"""
import argparse
import glob
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONF = 0.05   # in-graph candidate floor; host walk applies the eval threshold


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", default="repo")
    ap.add_argument("--checkpoints", required=True,
                    help="glob of orbax TrainState dirs or variables .npz")
    ap.add_argument("--val", default="data/mini/gen_anno_file_mini_val")
    ap.add_argument("--threshold", type=float, default=0.1)
    ap.add_argument("--platform", default=None, choices=["cpu"],
                    help="pin the CPU backend — lets a sweep run while a "
                         "training job holds the TPU (same contract as "
                         "train_pyramid.py --platform)")
    args = ap.parse_args()

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    else:
        from fdt.utils.cache import enable_tpu_compile_cache
        enable_tpu_compile_cache()

    import cv2

    from fdt.data.anno import parse_anno_file
    from fdt.eval.pr import TfConfAccumulator, average_precision
    from fdt.infer.pyramidbox import detections_to_rows
    from fdt.models.loader import load_pyramidbox_detector, load_variables

    paths = sorted(glob.glob(args.checkpoints),
                   key=lambda p: int((re.findall(r"(\d+)$", p) or [0])[0]))
    if not paths:
        raise SystemExit(f"no checkpoints match {args.checkpoints}")

    # load the val images once (resized to the shared 640² bucket)
    val = []
    for rec in parse_anno_file(args.val):
        im = cv2.imread(rec.path)
        ih, iw, _ = im.shape
        val.append((cv2.resize(im, (640, 640)),
                    rec.boxes_xywh.astype(np.float32)
                    * [640.0 / iw, 640.0 / ih, 640.0 / iw, 640.0 / ih]))

    det = load_pyramidbox_detector(args.net, None, budget=2048)
    out = {"net": args.net, "aps": {}}
    for path in paths:
        variables = load_variables(det.model, path, 640)
        det.variables = jax.device_put(variables)   # same compiled graph
        acc = TfConfAccumulator()
        for img, gt in val:
            t = det.detect_tensor(img[None], conf_thresh=CONF,
                                  nms_thresh=0.35)[0]
            acc.add(detections_to_rows(t, args.threshold,
                                       [640, 640, 640, 640]), gt)
        ap_v = float(average_precision(acc.finalize()))
        out["aps"][os.path.basename(path)] = round(ap_v, 4)
        print(f"# {path}: AP {ap_v:.4f}", flush=True)
    best = max(out["aps"], key=out["aps"].get)
    out["best"] = best
    out["best_ap"] = out["aps"][best]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
