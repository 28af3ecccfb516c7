"""Debug visualizers for the data factories and anchor matchers.

Re-designs of the reference's two visual-check utilities, headless-safe
(Agg backend, save-to-path instead of plt.show):

  * vis_two / vis_face — MTCNN before/after-calibration overlays used while
    generating hard-example training data (MTCNN/mtcnn/core/vision.py:6-140,
    called at gen_Rnet_train_data.py:65-67).
  * draw_matched_anchors — FaceBoxes encoder check drawing GT boxes and the
    anchor centers the encoder matched, one image per anchor scale group
    (DataEncoder.test_encode, FACEBOX/encoderl.py:93-156).
"""
from __future__ import annotations

import numpy as np


def _agg_plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def _panel(plt, im_rgb, dets, thresh):
    plt.imshow(im_rgb)
    for det in dets:
        if det[4] <= thresh:
            continue
        x1, y1, x2, y2 = det[:4]
        plt.gca().add_patch(plt.Rectangle((x1, y1), x2 - x1, y2 - y1,
                                          fill=False, edgecolor="red",
                                          linewidth=0.7))
        if det.shape[0] >= 15:  # landmark columns present
            lm = det[5:15].reshape(5, 2)
            plt.scatter(lm[:, 0], lm[:, 1], c="yellow", linewidths=0.1,
                        marker="x", s=5)


def vis_two(im_rgb: np.ndarray, dets_before: np.ndarray, dets_after: np.ndarray,
            thresh: float = 0.9, save_path: str | None = None):
    """Side-by-side detections before/after box calibration (vision.py:6-84)."""
    plt = _agg_plt()
    fig = plt.figure()
    plt.subplot(121)
    _panel(plt, im_rgb, dets_before, thresh)
    plt.subplot(122)
    _panel(plt, im_rgb, dets_after, thresh)
    if save_path:
        fig.savefig(save_path)
        plt.close(fig)
        return None
    return fig


def vis_face(im_rgb: np.ndarray, dets: np.ndarray,
             landmarks: np.ndarray | None = None,
             save_path: str | None = None):
    """Final detections + 5-point landmarks overlay (vision.py:87-140)."""
    from matplotlib.patches import Circle
    plt = _agg_plt()
    fig = plt.figure()
    plt.imshow(im_rgb)
    for det in dets:
        x1, y1, x2, y2 = det[:4]
        plt.gca().add_patch(plt.Rectangle((x1, y1), x2 - x1, y2 - y1,
                                          fill=False, edgecolor="yellow",
                                          linewidth=0.9))
    if landmarks is not None:
        for row in landmarks:
            for x, y in row.reshape(5, 2):
                plt.gca().add_patch(Circle((x, y), radius=2, alpha=0.4,
                                           color="red"))
    if save_path:
        fig.savefig(save_path)
        plt.close(fig)
        return None
    return fig


def draw_matched_anchors(image_bgr: np.ndarray, gt_boxes_norm: np.ndarray,
                         save_prefix: str | None = None, threshold: float = 0.35):
    """FaceBoxes encoder debug view (DataEncoder.test_encode, encoderl.py:93-156).

    Runs the densified-anchor encoder on normalized GT boxes and renders, per
    anchor scale group (32², 16², 8² maps), the anchor centers — matched
    anchors as large green circles, unmatched as small red dots — plus the GT
    boxes in green.  Returns the list of BGR images; with `save_prefix`, also
    writes `{prefix}_{i}.jpg` like the reference's test_encoder_{i}.jpg.
    """
    import cv2

    from fdt.anchors.densified import facebox_default_boxes, facebox_encode
    from fdt.config import FACEBOX

    import jax.numpy as jnp

    gt = np.asarray(gt_boxes_norm, np.float32).reshape(-1, 4)
    defaults = facebox_default_boxes(FACEBOX)
    _, conf = facebox_encode(jnp.asarray(gt), jnp.ones(len(gt), jnp.int32),
                             jnp.ones(len(gt), bool), defaults, threshold)
    conf = np.asarray(conf)
    s = image_bgr.shape[1]  # the reference scales by one side (encoderl.py:109)
    base = image_bgr.copy()
    for box in gt:
        cv2.rectangle(base, (int(box[0] * s), int(box[1] * s)),
                      (int(box[2] * s), int(box[3] * s)), (0, 255, 0))
    groups = [(0, 32 * 32 * 21), (32 * 32 * 21, 32 * 32 * 21 + 16 * 16),
              (32 * 32 * 21 + 16 * 16, len(defaults))]
    out = []
    for gi, (lo, hi) in enumerate(groups):
        im = base.copy()
        for i in range(lo, hi):
            cx, cy = int(defaults[i, 0] * s), int(defaults[i, 1] * s)
            if conf[i] != 0:
                cv2.circle(im, (cx, cy), 4, (0, 255, 0))
            else:
                cv2.circle(im, (cx, cy), 1, (0, 0, 255))
        if save_prefix:
            cv2.imwrite(f"{save_prefix}_{gi}.jpg", im)
        out.append(im)
    return out
