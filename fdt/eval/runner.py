"""WIDER-FACE evaluation drivers for the three detector families.

These are the My_test.py / FACEBOX/My_test_facebox.py / MTCNN/My_test_mtcnn.py
loops as library functions: iterate the eval collector, detect per image,
accumulate TF/confidence pairs, and write the reference-layout
`data_of_<name>.npy` dump.  An optional annotated-image writer replaces the
interactive cv2.imshow display (headless environments).
"""
from __future__ import annotations

import os
from typing import Iterable, Sequence

import numpy as np

from fdt.data.collector import EvalCollector
from fdt.eval.pr import TfConfAccumulator


def _draw(image, target_xywh, predict, out_path=None):  # pragma: no cover
    """GT-green/pred-red overlay (My_test.py:144-161); optionally written to
    out_path.  Single renderer for both the headless and live display paths."""
    import cv2
    img = image.copy()
    for box in target_xywh:
        cv2.rectangle(img, (box[0], box[1]),
                      (box[0] + box[2], box[1] + box[3]), (0, 255, 0), 1)
    for box in predict:
        score = box[4]
        b = box[:4].astype(np.int32)
        cv2.rectangle(img, (b[0], b[1]), (b[2], b[3]), (0, 0, 255), 1)
        cv2.putText(img, f"{score:.3f}", (b[0], b[1] - 2),
                    cv2.FONT_HERSHEY_PLAIN, 0.7, (0, 0, 255), 1)
    if out_path:
        cv2.imwrite(out_path, img)
    return img


def _run(detect_fn, anno_file: str, dump_path: str, iou_thresh: float = 0.5,
         skip_ids: Sequence[int] = (), display_dir: str | None = None,
         display: bool = False, snapshot_dir: str = ".",
         snapshot_prefix: str = "eval", progress: bool = True,
         limit: int | None = None, process_index: int | None = None,
         process_count: int | None = None) -> np.ndarray:
    """display=True opens the reference's live GT-green/pred-red window with
    the 's'-key snapshot writer (My_test.py:144-161); display_dir writes the
    same overlay per image headlessly instead.

    process_index/process_count shard the record list into contiguous blocks
    (multi-process eval: run one process per shard, no jax.distributed
    needed).  The dump written then is a RAW .npz part file
    (`<dump_path>.part<i>_of_<n>.npz`); merging the parts in process order
    (fdt.eval.pr.merge_part_files / scripts/merge_eval.py) reproduces the
    unsharded dump bit-exactly, tied confidences included."""
    if (process_index is None) != (process_count is None):
        raise ValueError("process_index and process_count must be passed "
                         "together (one alone would either crash in the "
                         "collector or silently run the full unsharded eval)")
    acc = TfConfAccumulator(iou_thresh)
    dataset = EvalCollector(anno_file, process_index, process_count)
    img_cnt = 0
    for image, target, img_id in dataset:
        if img_id in skip_ids:
            continue
        if limit is not None and img_id > limit:
            break
        if progress:
            print(f"testing image {img_id}...")
        predict = detect_fn(image)
        if display_dir:
            _draw(image, target, predict,
                  os.path.join(display_dir, f"{img_id}.jpg"))
        if display:  # pragma: no cover — needs a display server
            import cv2
            shown = _draw(image, target, predict)
            cv2.imshow("1", shown)
            if cv2.waitKey(1000) == ord("s"):
                path = os.path.join(snapshot_dir,
                                    f"{snapshot_prefix}_{img_cnt}.jpg")
                cv2.imwrite(path, shown)
                print(f"image saved in {snapshot_dir}")
                img_cnt += 1
        acc.add(predict, target)
    dump = acc.finalize()
    if dump_path:
        os.makedirs(os.path.dirname(dump_path) or ".", exist_ok=True)
        if process_count and process_count > 1:
            from fdt.eval.pr import save_raw_part
            base = dump_path[:-4] if dump_path.endswith(".npy") else dump_path
            save_raw_part(acc.raw(),
                          f"{base}.part{process_index}_of_{process_count}.npz")
        else:
            np.save(dump_path, dump)
    return dump


def eval_pyramidbox(detector, anno_file: str, threshold: float,
                    dump_path: str = "", **kw) -> np.ndarray:
    """My_test.py protocol: per-image native-resolution detection; rows are the
    prefix-walk of the [2,750,5] tensor (incl. sentinel), NMS 0.35."""
    def detect(image):
        return detector.detect_face(image, threshold)
    return _run(detect, anno_file, dump_path, **kw)


def eval_facebox(detector, anno_file: str, dump_path: str = "", **kw) -> np.ndarray:
    """FACEBOX/My_test_facebox.py protocol: 1024² resize, decode_np thresholds,
    boxes scaled back to the native resolution; empty prediction allowed."""
    def detect(image):
        boxes, probs = detector.detect(image)
        if len(probs) == 0:
            return np.empty((0, 5))
        return np.column_stack([boxes, probs])
    return _run(detect, anno_file, dump_path, **kw)


def eval_mtcnn(detector, anno_file: str, dump_path: str = "",
               skip_ids: Sequence[int] = (2852,), bucketed: bool = False,
               saturate_fallback=None, **kw) -> np.ndarray:
    """MTCNN/My_test_mtcnn.py protocol (min_face 24 detector, image 2852 skipped).

    bucketed=True routes through the device cascade's pad-to-bucket mode
    (MTCNNDeviceCascade.detect_face_bucketed): arbitrary eval resolutions
    share a handful of compiled cascades instead of one per (h, w), at a
    bounded right/bottom-seam drift (tests/test_mtcnn_device.py).

    When the device cascade reports budget saturation on an image (a fixed
    candidate cap may have truncated what the reference's unbounded lists
    would carry, detect.py:352), a warning is emitted; pass a host
    MTCNNDetector as `saturate_fallback` to re-detect that image through the
    unbounded oracle instead."""
    if bucketed:
        if not hasattr(detector, "detect_face_bucketed"):
            raise ValueError(
                "bucketed=True requires MTCNNDeviceCascade (the host "
                f"{type(detector).__name__} has no detect_face_bucketed)")
        fn = detector.detect_face_bucketed
    else:
        fn = detector.detect_face

    def detect(image):
        boxes, _ = fn(image)
        if getattr(detector, "last_saturated", False):
            import warnings
            if saturate_fallback is not None:
                warnings.warn("device-cascade budget saturated; falling back "
                              "to the host oracle for this image")
                boxes, _ = saturate_fallback.detect_face(image)
            else:
                warnings.warn("device-cascade budget saturated on an image; "
                              "detections may be truncated (pass "
                              "saturate_fallback= to re-run via the host "
                              "oracle)")
        return boxes if boxes.size else np.empty((0, 5))
    return _run(detect, anno_file, dump_path, skip_ids=skip_ids, **kw)
