"""MTCNN three-stage cascade inference.

Re-design of MTCNN/mtcnn/core/detect.py:66-620 with the conv forwards on TPU and
the (tiny, data-dependent) candidate bookkeeping on host:

  * PNet runs fully-convolutionally per pyramid level; levels are right/bottom
    zero-padded to 64-pixel buckets so XLA compiles a handful of shapes instead
    of one per level, and the score map is masked back to the exact valid cells
    (VALID convs ⇒ cells whose 12×12 window lies inside the true image are
    bit-identical to an unpadded run).
  * RNet/ONet batches are padded to power-of-two buckets for the same reason.
  * Greedy NMS / crop bookkeeping stays on host (numpy/cv2), reproducing the
    reference's exact candidate sets, including its in-place clamping of the
    squared boxes during pad() (detect.py:183-244).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from fdt.config import MTCNN, MTCNNConfig
from fdt.geometry.nms import nms_numpy
from fdt.models.mtcnn import ONet, PNet, RNet


def _bucket(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _pow2_bucket(n: int, lo: int = 16) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def generate_bounding_box(score_map: np.ndarray, reg: np.ndarray, scale: float,
                          threshold: float, stride: int = 2,
                          cellsize: int = 12) -> np.ndarray:
    """Score-map cells above threshold → [N,9] boxes (detect.py:134-181).
    Rows: x1, y1, x2, y2, score, reg0..3 (coords mapped to the original image)."""
    ys, xs = np.where(score_map > threshold)
    if ys.size == 0:
        return np.array([])
    score = score_map[ys, xs]
    r = reg[ys, xs]  # [N,4]
    return np.column_stack([
        np.round((stride * xs) / scale),
        np.round((stride * ys) / scale),
        np.round((stride * xs + cellsize) / scale),
        np.round((stride * ys + cellsize) / scale),
        score, r,
    ])


def square_bbox(bbox: np.ndarray) -> np.ndarray:
    """Center-preserving squarification (detect.py:102-131)."""
    sq = bbox.copy()
    h = bbox[:, 3] - bbox[:, 1] + 1
    w = bbox[:, 2] - bbox[:, 0] + 1
    la = np.maximum(h, w)
    sq[:, 0] = bbox[:, 0] + w * 0.5 - la * 0.5
    sq[:, 1] = bbox[:, 1] + h * 0.5 - la * 0.5
    sq[:, 2] = sq[:, 0] + la - 1
    sq[:, 3] = sq[:, 1] + la - 1
    return sq


def pad_clamp(dets: np.ndarray, w: int, h: int):
    """Crop bookkeeping for out-of-image boxes (detect.py:183-244).

    Returns (dy, edy, dx, edx, y, ey, x, ex, tmpw, tmph) int32 arrays and —
    like the reference, which writes through numpy views — clamps dets[:, :4]
    in place.
    """
    tmpw = (dets[:, 2] - dets[:, 0] + 1).astype(np.int32)
    tmph = (dets[:, 3] - dets[:, 1] + 1).astype(np.int32)
    n = dets.shape[0]
    dx = np.zeros(n)
    dy = np.zeros(n)
    edx, edy = tmpw.copy().astype(float) - 1, tmph.copy().astype(float) - 1
    x, y, ex, ey = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3]

    idx = np.where(ex > w - 1)
    edx[idx] = tmpw[idx] + w - 2 - ex[idx]
    ex[idx] = w - 1
    idx = np.where(ey > h - 1)
    edy[idx] = tmph[idx] + h - 2 - ey[idx]
    ey[idx] = h - 1
    idx = np.where(x < 0)
    dx[idx] = 0 - x[idx]
    x[idx] = 0
    idx = np.where(y < 0)
    dy[idx] = 0 - y[idx]
    y[idx] = 0
    return [a.astype(np.int32) for a in (dy, edy, dx, edx, y, ey, x, ex, tmpw, tmph)]


def _apply_regression(boxes: np.ndarray, reg: np.ndarray, scores: np.ndarray) -> np.ndarray:
    bw = boxes[:, 2] - boxes[:, 0] + 1
    bh = boxes[:, 3] - boxes[:, 1] + 1
    return np.column_stack([
        boxes[:, 0] + reg[:, 0] * bw,
        boxes[:, 1] + reg[:, 1] * bh,
        boxes[:, 2] + reg[:, 2] * bw,
        boxes[:, 3] + reg[:, 3] * bh,
        scores,
    ])


class MTCNNDetector:
    """pnet/rnet/onet variables → full cascade detect_face()."""

    def __init__(self, pnet_vars, rnet_vars, onet_vars, cfg: MTCNNConfig = MTCNN,
                 precision: str = "highest", dtype=None):
        self.cfg = cfg
        self.precision = precision
        self.pnet, self.rnet, self.onet = PNet(dtype=dtype), RNet(dtype=dtype), ONet(dtype=dtype)
        # stage params on device ONCE — host-numpy checkpoint trees would
        # otherwise re-upload over the host link on every jitted call
        self.vars = jax.device_put({"pnet": pnet_vars, "rnet": rnet_vars,
                                    "onet": onet_vars})
        # jitted forwards (shape-bucketed) as per-instance closures: a jitted
        # METHOD with static `self` would pin every detector instance (and its
        # device params) in the process-global jit cache forever — the same
        # retention hazard fixed in PyramidBoxDetector
        self._pnet_fwd = self._make_fwd(self.pnet)
        self._rnet_fwd = self._make_fwd(self.rnet)
        self._onet_fwd = self._make_fwd(self.onet)

    def _make_fwd(self, model):
        precision = self.precision  # capture the value, not self

        def fwd(variables, x):
            with jax.default_matmul_precision(precision):
                return model.apply(variables, x)

        return jax.jit(fwd)

    def _run_pnet_level(self, im_resized: np.ndarray):
        """One pyramid level with bucket padding + valid-cell masking."""
        h, w, _ = im_resized.shape
        hb, wb = _bucket(h, 64), _bucket(w, 64)
        canvas = np.zeros((hb, wb, 3), np.float32)
        canvas[:h, :w] = im_resized.astype(np.float32) / 255.0
        cls_map, reg = self._pnet_fwd(self.vars["pnet"], canvas[None])
        cls_map = np.asarray(cls_map)[0, :, :, 0]
        reg = np.asarray(reg)[0]
        # valid PNet cells: window [2i, 2i+12) must lie inside the true image
        vh = max((h - 12) // 2 + 1, 0)
        vw = max((w - 12) // 2 + 1, 0)
        return cls_map[:vh, :vw], reg[:vh, :vw]

    def detect_pnet(self, im: np.ndarray):
        """Image-pyramid proposal stage (detect.py:246-350)."""
        import cv2
        cfg = self.cfg
        net_size = 12
        current_scale = net_size / cfg.min_face_size
        im_resized = cv2.resize(im, None, fx=current_scale, fy=current_scale,
                                interpolation=cv2.INTER_LINEAR)
        all_boxes = []
        while min(im_resized.shape[0], im_resized.shape[1]) > net_size:
            cls_map, reg = self._run_pnet_level(im_resized)
            boxes = generate_bounding_box(cls_map, reg, current_scale,
                                          cfg.thresholds[0], cfg.stride, cfg.cell_size)
            current_scale *= cfg.scale_factor
            im_resized = cv2.resize(im, None, fx=current_scale, fy=current_scale,
                                    interpolation=cv2.INTER_LINEAR)
            if boxes.size == 0:
                continue
            keep = nms_numpy(boxes[:, :4], boxes[:, 4],
                             cfg.pnet_nms_per_level, "minimum")
            all_boxes.append(boxes[keep])
        if not all_boxes:
            return None, None
        all_boxes = np.vstack(all_boxes)
        keep = nms_numpy(all_boxes[:, :4], all_boxes[:, 4],
                         cfg.pnet_nms_merge, "union")
        all_boxes = all_boxes[keep]
        boxes_align = _apply_regression(all_boxes[:, :4], all_boxes[:, 5:9],
                                        all_boxes[:, 4])
        return all_boxes[:, :5], boxes_align

    def _crop_batch(self, im: np.ndarray, dets: np.ndarray, size: int) -> np.ndarray:
        """Square-pad-crop-resize every candidate (detect.py:396-405)."""
        import cv2
        h, w, _ = im.shape
        dy, edy, dx, edx, y, ey, x, ex, tmpw, tmph = pad_clamp(dets, w, h)
        crops = np.zeros((dets.shape[0], size, size, 3), np.float32)
        for i in range(dets.shape[0]):
            tmp = np.zeros((tmph[i], tmpw[i], 3), np.uint8)
            tmp[dy[i]:edy[i] + 1, dx[i]:edx[i] + 1] = im[y[i]:ey[i] + 1, x[i]:ex[i] + 1]
            crops[i] = cv2.resize(tmp, (size, size)).astype(np.float32) / 255.0
        return crops

    def _batched_fwd(self, fwd, variables, crops: np.ndarray):
        """Pad the candidate batch to a pow-2 bucket so jit shapes are reused."""
        n = crops.shape[0]
        b = _pow2_bucket(n)
        if b != n:
            crops = np.concatenate([crops, np.zeros((b - n,) + crops.shape[1:],
                                                    crops.dtype)])
        outs = fwd(variables, crops)
        return tuple(np.asarray(o)[:n] for o in outs)

    def detect_rnet(self, im: np.ndarray, dets: np.ndarray):
        """Refinement stage (detect.py:352-465)."""
        if dets is None:
            return None, None
        cfg = self.cfg
        dets = square_bbox(dets)
        dets[:, 0:4] = np.round(dets[:, 0:4])
        crops = self._crop_batch(im, dets, 24)  # pad_clamp clamps dets in place
        cls_map, reg = self._batched_fwd(self._rnet_fwd, self.vars["rnet"], crops)
        keep_inds = np.where(cls_map > cfg.thresholds[1])[0]
        if len(keep_inds) == 0:
            return None, None
        boxes, cls, reg = dets[keep_inds], cls_map[keep_inds], reg[keep_inds]
        keep = nms_numpy(boxes[:, :4], boxes[:, 4], cfg.rnet_nms, "union")
        if len(keep) == 0:
            return None, None
        keep_boxes, keep_cls, keep_reg = boxes[keep], cls[keep], reg[keep]
        keep_boxes[:, 4] = keep_cls[:, 0]
        boxes_align = _apply_regression(keep_boxes[:, :4], keep_reg, keep_cls[:, 0])
        return keep_boxes, boxes_align

    def detect_onet(self, im: np.ndarray, dets: np.ndarray):
        """Output stage with landmarks (detect.py:467-583)."""
        if dets is None:
            return None, None
        cfg = self.cfg
        dets = square_bbox(dets)
        dets[:, 0:4] = np.round(dets[:, 0:4])
        crops = self._crop_batch(im, dets, 48)
        cls_map, reg, landmark = self._batched_fwd(self._onet_fwd,
                                                   self.vars["onet"], crops)
        keep_inds = np.where(cls_map > cfg.thresholds[2])[0]
        if len(keep_inds) == 0:
            return None, None
        boxes = dets[keep_inds]
        cls, reg, landmark = cls_map[keep_inds], reg[keep_inds], landmark[keep_inds]

        boxes_align = _apply_regression(boxes[:, :4], reg, cls[:, 0])
        bw = boxes[:, 2] - boxes[:, 0] + 1
        bh = boxes[:, 3] - boxes[:, 1] + 1
        lm = np.empty_like(landmark)
        lm[:, 0::2] = boxes[:, 0:1] + landmark[:, 0::2] * bw[:, None]
        lm[:, 1::2] = boxes[:, 1:2] + landmark[:, 1::2] * bh[:, None]

        keep = nms_numpy(boxes_align[:, :4], boxes_align[:, 4],
                         cfg.onet_nms, "minimum")
        return boxes_align[keep], lm[keep]

    def detect_face(self, img: np.ndarray):
        """Full cascade (detect.py:585-620): → (boxes [N,5], landmarks [N,10])."""
        _, boxes_align = self.detect_pnet(img)
        if boxes_align is None:
            return np.array([]), np.array([])
        _, boxes_align = self.detect_rnet(img, boxes_align)
        if boxes_align is None:
            return np.array([]), np.array([])
        boxes_align, landmark_align = self.detect_onet(img, boxes_align)
        if boxes_align is None:
            return np.array([]), np.array([])
        return boxes_align, landmark_align


def load_mtcnn_detector(p_path: str, r_path: str, o_path: str,
                        cfg: MTCNNConfig = MTCNN, **kw) -> MTCNNDetector:
    """Build a detector from the reference .pt checkpoints
    (create_mtcnn_net, detect.py:14-63)."""
    from fdt.models.mtcnn import mtcnn_linear_transforms
    from fdt.models.torch_convert import load_torch_state_dict, torch_to_flax

    sizes = {"pnet": 12, "rnet": 24, "onet": 48}
    models = {"pnet": PNet(), "rnet": RNet(), "onet": ONet()}
    variables = {}
    for name, path in (("pnet", p_path), ("rnet", r_path), ("onet", o_path)):
        tmpl = jax.eval_shape(lambda m=models[name], s=sizes[name]:
                              m.init(jax.random.PRNGKey(0), jnp.zeros((1, s, s, 3))))
        tmpl = jax.tree.map(lambda sh: np.zeros(sh.shape, sh.dtype), tmpl)
        variables[name] = torch_to_flax(load_torch_state_dict(path), tmpl,
                                        strict=True,
                                        transforms=mtcnn_linear_transforms(name))
    return MTCNNDetector(variables["pnet"], variables["rnet"], variables["onet"],
                         cfg, **kw)
