"""Detection-quality metric harness: per-image TF/confidence accounting and the
`.npy` dump format shared with the reference's PR/ROC tooling.

Reference: utils/calc_performance.py:77-92 (`calc_pr`), My_test.py:105-171
(accumulation + sorted dump), draw_curve/draw_pr_roc.py:5-43 (curve generation).
The dump layout is bit-compatible: a [2, D+1] array whose first row is the
greater-than-IoU-threshold flag per detection, second row the confidence, sorted
by descending confidence, with a final [[0], [total_gt]] column appended.
"""
from __future__ import annotations

import numpy as np


def calc_pr(predict: np.ndarray, truth_xywh: np.ndarray, iou_thresh: float = 0.5):
    """Per-image true/false accounting.

    Args:
      predict: [N,5] float [x1, y1, x2, y2, score].
      truth_xywh: [M,4] [x, y, w, h].
      iou_thresh: match threshold.

    Returns ([2,N] array of (tf_flag, score) columns, M).
    """
    truth = np.hstack((truth_xywh[:, :2], truth_xywh[:, 2:] + truth_xywh[:, :2])).astype(np.float64)
    pred = predict[:, :4].astype(np.float64)
    inter_w = np.maximum(0, np.minimum(truth[:, None, 2], pred[None, :, 2]) -
                         np.maximum(truth[:, None, 0], pred[None, :, 0]))
    inter_h = np.maximum(0, np.minimum(truth[:, None, 3], pred[None, :, 3]) -
                         np.maximum(truth[:, None, 1], pred[None, :, 1]))
    inter = inter_w * inter_h
    area_t = (truth[:, 2] - truth[:, 0]) * (truth[:, 3] - truth[:, 1])
    area_p = (pred[:, 2] - pred[:, 0]) * (pred[:, 3] - pred[:, 1])
    iou = inter / (area_t[:, None] + area_p[None, :] - inter)
    tf = (np.max(iou, axis=0) > iou_thresh).astype(np.int32)
    return np.vstack((tf, predict[:, 4])), truth.shape[0]


class TfConfAccumulator:
    """Accumulates per-image calc_pr outputs and writes the reference dump."""

    def __init__(self, iou_thresh: float = 0.5):
        self.iou_thresh = iou_thresh
        self.tf_conf = np.array([[], []])
        self.truth_num = 0

    def add(self, predict: np.ndarray, truth_xywh: np.ndarray):
        if len(predict) == 0:
            self.truth_num += truth_xywh.shape[0]
            return
        tf_conf, n = calc_pr(predict, truth_xywh, self.iou_thresh)
        self.tf_conf = np.hstack((self.tf_conf, tf_conf))
        self.truth_num += n

    def finalize(self) -> np.ndarray:
        """Sorted-desc [2, D+1] dump (My_test.py:169-171)."""
        order = np.argsort(self.tf_conf[1, :])[::-1]
        sorted_tc = self.tf_conf[:, order]
        return np.hstack((sorted_tc, [[0], [self.truth_num]]))

    def save(self, path: str):
        np.save(path, self.finalize())


def merge_dumps(dumps) -> np.ndarray:
    """Merge per-process finalized dumps into the single-process dump.

    Multi-host eval shards the record list into CONTIGUOUS blocks
    (fdt.data.EvalCollector), so concatenating the per-process detection
    columns in process order reproduces the unsharded accumulation order
    exactly; one re-sort and a summed GT sentinel then yield a dump
    bit-identical to an unsharded run (tests/test_data_eval.py).
    """
    parts = [np.asarray(d) for d in dumps]
    tf_conf = np.hstack([p[:, :-1] for p in parts] or [np.zeros((2, 0))])
    truth_num = sum(p[1, -1] for p in parts)
    order = np.argsort(tf_conf[1, :])[::-1]
    return np.hstack((tf_conf[:, order], [[0], [truth_num]]))


def gen_tp_fp(dump: np.ndarray):
    """Cumulative TP/FP over the sorted dump (draw_curve/draw_pr_roc.py:5-20)."""
    tf, conf = dump[0, :-1], dump[1, :-1]
    truth_num = dump[1, -1]
    tp = np.cumsum(tf)
    fp = np.cumsum(1 - tf)
    return tp, fp, truth_num, conf


def pr_curve(dump: np.ndarray):
    """(recall, precision) arrays (draw_pr_roc.py:22-31)."""
    tp, fp, truth_num, _ = gen_tp_fp(dump)
    recall = tp / truth_num
    precision = tp / np.maximum(tp + fp, 1)
    return recall, precision


def roc_curve(dump: np.ndarray):
    """(false positives, recall) arrays (draw_pr_roc.py:33-43)."""
    tp, fp, truth_num, _ = gen_tp_fp(dump)
    return fp, tp / truth_num


def average_precision(dump: np.ndarray) -> float:
    """AP via trapezoidal integration of the PR curve (for reporting)."""
    recall, precision = pr_curve(dump)
    if recall.size == 0:
        return 0.0
    return float(np.trapezoid(precision, recall))
