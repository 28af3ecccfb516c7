"""Fixed-shape greedy NMS for TPU.

The reference runs greedy NMS as a data-dependent Python loop over tensors
(layers/box_utils.py:275-340, FACEBOX/encoderl.py:217-266, MTCNN/mtcnn/core/utils.py:62-113)
— thousands of host↔device round-trips per image.  Here the same *greedy* result is
computed entirely on device with static shapes:

  1. take the top-`budget` boxes by score (padding with -inf scores),
  2. build the pairwise suppression matrix S[j, i] = (j < i) ∧ (overlap(j, i) ≥ τ),
  3. solve the greedy recurrence  keep[i] = valid[i] ∧ ¬∃j: S[j,i] ∧ keep[j]
     by fixpoint iteration (lax.while_loop).  The recurrence is a DAG in score
     order, so after k sweeps every box whose suppression-chain depth ≤ k is
     final; real detection workloads converge in a handful of sweeps, each sweep
     being one [N,N]·[N] masked reduction on the VPU instead of N sequential steps.

This reproduces exactly the keep-set and order of the reference's greedy loops
(which suppress when overlap >= threshold and keep survivors in descending-score
order), for both IoU ("union") and min-area ("minimum") overlap modes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from fdt.geometry.boxes import iou_matrix


def nms_numpy(boxes: np.ndarray, scores: np.ndarray, thresh: float,
              mode: str = "union") -> list[int]:
    """Host greedy NMS — exact reference semantics (MTCNN/mtcnn/core/utils.py:62-113,
    FACEBOX/encoderl.py:217-266): descending-score order, suppress overlap >= thresh,
    'union' (IoU) or 'minimum' (inter / min-area) overlap.  Used by host-side
    cascade post-processing; the device path is nms_padded."""
    boxes = np.asarray(boxes, np.float64)
    scores = np.asarray(scores, np.float64)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1) * (y2 - y1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        inter = np.maximum(0.0, xx2 - xx1) * np.maximum(0.0, yy2 - yy1)
        if mode == "union":
            ovr = inter / (areas[i] + areas[order[1:]] - inter)
        elif mode == "minimum":
            ovr = inter / np.minimum(areas[i], areas[order[1:]])
        else:
            raise ValueError(f"unknown NMS mode: {mode}")
        order = order[1:][ovr < thresh]
    return keep


def _overlap_matrix(boxes: jnp.ndarray, mode: str) -> jnp.ndarray:
    """Pairwise overlap, [N,4] → [N,N], point form.

    mode="union"   : IoU (reference nms / nms_np "Union")
    mode="minimum" : intersection / min(area_a, area_b) (MTCNN "Minimum",
                     MTCNN/mtcnn/core/utils.py:100-104)
    """
    if mode == "union":
        return iou_matrix(boxes, boxes)
    if mode == "minimum":
        from fdt.geometry.boxes import intersect
        inter = intersect(boxes, boxes)
        area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        return inter / jnp.minimum(area[:, None], area[None, :])
    raise ValueError(f"unknown NMS mode: {mode}")


def nms_keep_mask(boxes: jnp.ndarray, valid: jnp.ndarray, iou_thresh: float,
                  mode: str = "union",
                  seg_id: jnp.ndarray | None = None,
                  impl: str = "xla") -> jnp.ndarray:
    """Greedy-NMS keep mask over boxes already sorted by descending score.

    Args:
      boxes: [N,4] point-form boxes in descending-score order.
      valid: [N] bool; padding / below-threshold entries are False.
      iou_thresh: suppression threshold; overlap >= iou_thresh suppresses
        (matches `IoU.lt(overlap)` survivors at layers/box_utils.py:339 and
        `ovr < threshold` at encoderl.py:260).
      mode: "union" | "minimum".
      seg_id: optional [N] int segment ids; suppression then only acts within
        a segment, computing every segment's independent greedy NMS in one
        fixpoint (used for MTCNN's per-pyramid-level NMS, detect.py:314).
      impl: "xla" | "pallas_tiled" | "auto".  The XLA fixpoint re-reads the
        [N,N] suppression matrix from HBM every sweep; the tiled Pallas kernel
        streams it through VMEM once, winning for large N on TPU ("auto"
        picks it there for N ≥ 2048, same crossover as nms_padded).

    Returns: [N] bool keep mask (subset of `valid`).
    """
    n = boxes.shape[0]
    if impl == "auto":
        from fdt.utils.devices import default_platform
        impl = ("pallas_tiled" if default_platform() == "tpu" and n >= 2048
                else "xla")
    if impl == "pallas_tiled":
        from fdt.ops.pallas_nms import pallas_nms_keep_tiled
        return pallas_nms_keep_tiled(boxes, valid, iou_thresh, mode=mode,
                                     seg_id=seg_id)
    ov = _overlap_matrix(boxes, mode)
    idx = jnp.arange(n)
    # S[j, i]: an earlier (higher-score) valid box j suppresses i.
    suppress = (ov >= iou_thresh) & (idx[:, None] < idx[None, :]) & valid[:, None]
    if seg_id is not None:
        suppress &= seg_id[:, None] == seg_id[None, :]

    def cond(state):
        keep, prev, it = state
        return (it < n) & jnp.any(keep != prev)

    def body(state):
        keep, _, it = state
        new = valid & ~jnp.any(suppress & keep[:, None], axis=0)
        return new, keep, it + 1

    keep0 = valid
    keep, _, _ = jax.lax.while_loop(cond, body, (keep0, ~keep0, jnp.int32(0)))
    return keep


@functools.partial(jax.jit, static_argnames=("budget", "out_k", "mode", "impl"))
def nms_padded(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thresh,
               budget: int, out_k: int, mode: str = "union",
               valid: jnp.ndarray | None = None, impl: str = "auto"):
    """Greedy NMS with fixed-size output.

    Args:
      boxes:  [N,4] point-form.
      scores: [N]; entries to ignore should carry -inf (or pass `valid`).
      iou_thresh: suppression threshold (traced or static).
      budget: static — number of top-score boxes entering NMS
        (reference `nms_top_k`, layers/functions/detection.py:32).
      out_k:  static — detections returned (reference `top_k`=750).
      mode:   "union" | "minimum".
      valid:  optional [N] bool mask.
      impl:   "xla" | "pallas" | "pallas_tiled" | "auto".  "auto" picks the
        tiled Pallas kernel on TPU for budgets ≥ 2048 and the XLA fixpoint
        otherwise — the crossover measured on v5e across clustered/dense
        score distributions (2026-08): at budget 5000 the tiled kernel runs
        ~1.4ms vs 2.0ms XLA vs 3.1ms per-box Pallas; at 1024 all are within
        ~0.2ms of each other.  All three produce identical keep-sets.

    Returns:
      keep_idx: [out_k] int32 indices into the input arrays, in descending-score
        order; entries past `count` are arbitrary (mask with count).
      count:   scalar int32 number of kept boxes (≤ out_k).
    """
    n = scores.shape[0]
    if valid is not None:
        scores = jnp.where(valid, scores, -jnp.inf)
    k = min(budget, n)
    if impl == "auto":
        from fdt.utils.devices import default_platform
        impl = ("pallas_tiled" if default_platform() == "tpu" and k >= 2048
                else "xla")
    top_scores, order = jax.lax.top_k(scores, k)
    top_boxes = boxes[order]
    top_valid = top_scores > -jnp.inf
    if impl == "pallas":
        from fdt.ops.pallas_nms import pallas_nms_keep
        keep = pallas_nms_keep(top_boxes, top_valid, iou_thresh, mode=mode)
    elif impl == "pallas_tiled":
        from fdt.ops.pallas_nms import pallas_nms_keep_tiled
        # out_k bounds the kernel's tile sweep: this function only ever
        # exposes the first out_k keeps, so the kernel may stop once it has
        # found them (dense-scene dual of the active-prefix early exit)
        keep = pallas_nms_keep_tiled(top_boxes, top_valid, iou_thresh,
                                     mode=mode, out_k=out_k)
    else:
        keep = nms_keep_mask(top_boxes, top_valid, iou_thresh, mode=mode)
    # Stable-compact kept entries to the front (they are already score-ordered).
    comp = jnp.argsort(~keep, stable=True)
    count = jnp.minimum(jnp.sum(keep), out_k).astype(jnp.int32)
    if out_k <= k:
        keep_idx = order[comp[:out_k]]
    else:
        pad = jnp.zeros(out_k - k, dtype=order.dtype)
        keep_idx = jnp.concatenate([order[comp], pad])
    return keep_idx.astype(jnp.int32), count
