#!/usr/bin/env python
"""Trained-weights reality check (VERDICT r2 item 10).

Given a trained try3 variables .npz (scripts/export_weights.py), measure the
quantities whose round-2 bounds rested on untrained weights, and print them
as JSON so the numbers can be pinned in tests/docstrings:

  * sample-image detection counts across thresholds (score distribution)
  * bucketed-eval pad-seam drift (fdt/eval/batched.py caveat)
  * bf16-vs-f32 keep-set drift at eval thresholds (tests/test_bf16_drift.py)
  * tracker-scene density + association behavior (bench.py rows[:32] cap)
  * pseudo-labeled mini-val AP at a fixed bucket (train->eval end-to-end)

Runs on the CPU backend (per-shape compiles are minutes; the TPU stays
free).  All device passes share one in-graph conf threshold (0.05) so the
jit cache compiles one graph per input SHAPE only; eval thresholds are
applied on host via detections_to_rows.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import json

import numpy as np

CONF = 0.05   # in-graph candidate floor; host walks apply the real thresholds


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default="net_weight/try3_mini.npz")
    ap.add_argument("--net", default="try3")
    ap.add_argument("--ap-only", action="store_true",
                    help="mini-val AP only (skips seam/bf16/tracker): the "
                         "cheap checkpoint-selection metric — one graph "
                         "compile, 6 val images")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import cv2
    import jax.numpy as jnp
    from fdt.config import PIXEL_MEAN_BGR
    from fdt.geometry.boxes import iou_matrix
    from fdt.infer.pyramidbox import PyramidBoxDetector, detections_to_rows
    from fdt.models.loader import load_pyramidbox_detector
    from fdt.models.pyramidbox_mobile import build_pyramidbox

    out = {}
    det = load_pyramidbox_detector(args.net, args.weights, budget=2048)

    def rows_at(d, image_bgr, threshold):
        h, w, _ = image_bgr.shape
        t = d.detect_tensor(image_bgr[None], conf_thresh=CONF, nms_thresh=0.35)[0]
        return detections_to_rows(t, threshold, [w, h, w, h])

    crowd = cv2.imread("/root/reference/image_and_anno/test_image/try1/"
                       "try1_thresh_0.39_13.jpg")           # 12 GT faces
    img = cv2.resize(crowd, (640, 640))

    if args.ap_only:
        _measure_ap(det, rows_at, out)
        print(json.dumps(out, indent=1))
        return

    # -- score distribution ------------------------------------------------
    rows = rows_at(det, img, 0.05)
    out["counts_by_threshold"] = {
        str(t): int((rows[:, 4] >= t).sum()) for t in (0.1, 0.3, 0.4, 0.5, 0.8)}

    # -- pad-seam drift (mirror tests/test_batched_eval_seam.py) -----------
    small = cv2.resize(crowd, (620, 600))                   # pads to 640x640
    native = rows_at(det, small, 0.3)
    h, w, _ = small.shape
    canvas = np.zeros((1, 640, 640, 3), np.uint8)
    canvas[0, :, :] = np.array(PIXEL_MEAN_BGR, np.float32).astype(np.uint8)
    canvas[0, :h, :w] = small
    b = det.detect_tensor(canvas, conf_thresh=CONF, nms_thresh=0.35)
    batched = detections_to_rows(b[0], 0.3, [640, 640, 640, 640])
    iou = np.asarray(iou_matrix(jnp.asarray(native[:, :4]),
                                jnp.asarray(batched[:, :4])))
    j = iou.argmax(1)
    matched = iou.max(1) > 0.5
    out["seam"] = {
        "native_rows": int(len(native)), "batched_rows": int(len(batched)),
        "matched_frac": round(float(matched.mean()), 4),
        "max_score_delta": (round(float(
            np.abs(native[matched, 4] - batched[j[matched], 4]).max()), 4)
            if matched.any() else None),
        "min_matched_iou": (round(float(iou.max(1)[matched].min()), 4)
                            if matched.any() else None),
    }

    # -- bf16 drift --------------------------------------------------------
    model16 = build_pyramidbox(args.net, dtype=jnp.bfloat16)
    det16 = PyramidBoxDetector(det.variables, model16, args.net,
                               precision="default", budget=2048)
    r32 = rows_at(det, img, 0.35)
    r16 = rows_at(det16, img, 0.35)
    iou = np.asarray(iou_matrix(jnp.asarray(r32[:, :4]), jnp.asarray(r16[:, :4])))
    m = iou.max(1) > 0.5
    out["bf16"] = {
        "f32_rows": int(len(r32)), "bf16_rows": int(len(r16)),
        "f32_top_scores": [round(float(s), 3) for s in sorted(r32[:, 4])[-5:]],
        "bf16_top_scores": [round(float(s), 3) for s in sorted(r16[:, 4])[-5:]],
        "matched_frac": round(float(m.mean()), 4),
        "median_matched_iou": (round(float(np.median(iou.max(1)[m])), 4)
                               if m.any() else None),
        "max_score_delta": (round(float(
            np.abs(r32[m, 4] - r16[iou.argmax(1)[m], 4]).max()), 4)
            if m.any() else None),
    }

    # -- tracker scene -----------------------------------------------------
    from fdt.track.iou_tracker import IoUTracker
    tracker = IoUTracker()
    dens = []
    for f in range(12):                                     # slow pan
        M = np.float32([[1, 0, -6 * f], [0, 1, 0]])
        frame = cv2.warpAffine(img, M, (640, 640), borderMode=cv2.BORDER_REFLECT)
        r = rows_at(det, frame, 0.4)
        dens.append(0 if (len(r) == 1 and r[0, 4] == 0.4
                          and not r[0, :4].any()) else len(r))
        tracker.step(r)
    finished = tracker.flush()
    out["tracker"] = {
        "dets_per_frame_min": int(min(dens)), "dets_per_frame_max": int(max(dens)),
        "tracks": int(len(finished)),
        "track_lens": sorted(len(t["bboxes"]) for t in finished)[-5:],
    }

    # -- mini-val AP -------------------------------------------------------
    _measure_ap(det, rows_at, out)

    print(json.dumps(out, indent=1))


def _measure_ap(det, rows_at, out):
    import cv2
    from fdt.data.anno import parse_anno_file
    from fdt.eval.pr import TfConfAccumulator, average_precision
    acc = TfConfAccumulator()
    for rec in parse_anno_file("data/mini/gen_anno_file_mini_val"):
        im = cv2.imread(rec.path)
        ih, iw, _ = im.shape
        sx, sy = 640.0 / iw, 640.0 / ih
        r = rows_at(det, cv2.resize(im, (640, 640)), 0.1)
        gt = rec.boxes_xywh.astype(np.float32) * [sx, sy, sx, sy]
        # the [[0,0,0,0,0.4]] no-detection sentinel is scored as a (guaranteed
        # false-positive) row on purpose — the reference's eval dump includes
        # it too (My_test.py:61-62), and this AP follows that exact protocol
        acc.add(r, gt)
    out["mini_val_ap"] = round(float(average_precision(acc.finalize())), 4)


if __name__ == "__main__":
    main()
