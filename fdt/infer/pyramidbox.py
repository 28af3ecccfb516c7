"""End-to-end PyramidBox inference.

Reference pipeline (My_test.py:22-72): per-image mean-subtract → forward →
softmax → Detect (host Python NMS) → host walk of the [2,750,5] tensor.
Here preprocess/forward/decode/NMS run as one jitted graph per input shape
(shape-bucketed cache), and the final row walk is a vectorized host step that
reproduces the reference's `while score >= threshold` semantics bit-for-bit —
including its quirk of walking the all-zero class-0 rows when threshold <= 0.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fdt.anchors import feature_map_sizes, pyramid_face_priors
from fdt.config import (DetectConfig, PIXEL_MEAN_BGR, PYRAMID_CONFIGS,
                        PyramidConfig)
from fdt.infer.detect import ssd_detect


def _stem_s2d(variables, x, precision, dtype=None):
    """PyramidBox ResNet50 stem with a space-to-depth strided conv (same
    params as the model's conv1/bn1 — pyramid.py:110-112 here,
    reference pyramid.py:107-110).

    conv1 (7×7/2, 3→64 over 640²) runs at ~1% MXU utilization as a direct
    conv (3 input channels pad to 128 lanes); packing the stride's 2×2
    spatial phases into channels turns it into a 4×4 VALID conv with a
    K=4·4·12=192 contraction at 1/4 the spatial extent — the same exact
    rearrangement already carrying the FaceBoxes RDCL and MTCNN PNet stems
    (fdt.ops.s2d; parity bounded by tests/test_pyramidbox.py).
    """
    from fdt.models.common import max_pool
    from fdt.ops.s2d import (conv_valid_batched, pad_cells, space_to_depth,
                             strided_s2d_kernel)

    p, bs = variables["params"], variables["batch_stats"]
    k = p["conv1"]["kernel"]                         # [7, 7, 3, 64], no bias
    g, b = p["bn1"]["scale"], p["bn1"]["bias"]
    mu, var = bs["bn1"]["mean"], bs["bn1"]["var"]
    if dtype is not None:  # mirror the model's bf16 compute flow
        x, k, g, b, mu, var = (t.astype(dtype) for t in (x, k, g, b, mu, var))
    h, w = x.shape[1], x.shape[2]
    oh, ow = (h + 6 - 7) // 2 + 1, (w + 6 - 7) // 2 + 1
    y = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))  # conv1's own padding
    y = space_to_depth(pad_cells(y, 2), 2)
    y = conv_valid_batched(y, strided_s2d_kernel(k, 2),
                           precision)[:, :oh, :ow]
    y = g * (y - mu) * jax.lax.rsqrt(var + 1e-5) + b  # inference BN, eps 1e-5
    return max_pool(jnp.maximum(y, 0.0), 3, 2, 1)


def detections_to_rows(det: np.ndarray, threshold: float, scale,
                       shrink: float = 1.0) -> np.ndarray:
    """Walk a [C, top_k, 5] detection tensor like My_test.py:47-72.

    For every class (including background class 0, whose rows are zeros) take
    the PREFIX of rows with score >= threshold, scale boxes to pixels, divide
    by `shrink`, and stack [x1, y1, x2, y2, score] rows.  Returns the
    [[0, 0, 0, 0, 0.4]] sentinel when nothing qualifies (My_test.py:61-62).
    """
    rows = []
    scale = np.asarray(scale, np.float32)
    for cl in range(det.shape[0]):
        s = det[cl, :, 0]
        take = int(np.cumprod(s >= threshold).sum())
        if take:
            rows.append(np.column_stack([det[cl, :take, 1:5] * scale / shrink,
                                         s[:take]]))
    if not rows:
        return np.array([[0, 0, 0, 0, 0.4]], np.float32)
    return np.concatenate(rows, axis=0)


class PyramidBoxDetector:
    """Shape-bucketed jitted PyramidBox detector (any variant)."""

    def __init__(self, variables, model, cfg: PyramidConfig | str = "repo",
                 detect_cfg: DetectConfig | None = None,
                 precision: str = "highest", budget: int = 5000,
                 quant: str | None = None, mesh=None,
                 stem_impl: str | None = None):
        if isinstance(cfg, str):
            cfg = PYRAMID_CONFIGS[cfg]
        self.cfg = cfg
        self.model = model
        # space-to-depth 7×7/2 stem rides the MXU; the direct conv wins on
        # CPU.  Only the ResNet50 flagship has this stem (the mobile variants
        # start 3×3) — same auto rule as FaceBoxDetector.
        from fdt.models.pyramidbox import PyramidBox
        if stem_impl is None:
            from fdt.utils.devices import default_platform
            stem_impl = ("s2d" if default_platform() == "tpu"
                         and type(model) is PyramidBox else "direct")
        if stem_impl == "s2d" and type(model) is not PyramidBox:
            raise ValueError("stem_impl='s2d' requires the ResNet50 flagship")
        self.stem_impl = stem_impl
        # mesh: optional jax.sharding.Mesh for data-parallel batched
        # inference — params replicate, detect_tensor batches shard over the
        # `data` axis (padded to a mesh multiple) and XLA runs the whole
        # detect graph SPMD.  Per-example math is unchanged (batch elements
        # are independent), so results equal the unsharded detector.
        self.mesh = mesh
        if mesh is not None:
            from fdt.dist import replicated
            variables = jax.device_put(variables, replicated(mesh))
        # stage params on device ONCE — host-numpy checkpoint trees would
        # otherwise re-upload over the host link on every jitted call
        self.variables = jax.device_put(variables)
        self.detect_cfg = detect_cfg or cfg.detect
        self.precision = precision
        self.budget = budget
        # opt-in int8 post-training quantization (fdt.ops.quant); drift vs
        # the float path is pinned in tests/test_quant.py
        self.quant = quant
        self._mean = jnp.asarray(PIXEL_MEAN_BGR, jnp.float32)
        # per-instance jit cache: an lru_cache on the bound method would keep
        # `self` (device params) alive in a process-global table forever.
        # Bounded (LRU) because native-resolution eval sweeps see hundreds of
        # distinct (w, h) shapes — unbounded retention of one compiled
        # executable per shape grows memory for the life of the detector.
        from collections import OrderedDict
        self._jitted: OrderedDict = OrderedDict()
        self._jitted_max = 64

    def _compiled(self, width: int, height: int, conf_thresh: float,
                  nms_thresh: float):
        key = (width, height, conf_thresh, nms_thresh)
        fn = self._jitted.get(key)
        if fn is None:
            fn = self._jitted[key] = self._build(width, height, conf_thresh,
                                                 nms_thresh)
            if len(self._jitted) > self._jitted_max:
                self._jitted.popitem(last=False)
        else:
            self._jitted.move_to_end(key)
        return fn

    def _build(self, width: int, height: int, conf_thresh: float,
               nms_thresh: float):
        # source shapes from an abstract trace: exact for every variant,
        # including try4/try5's non-ceil-halving stem/smooth quirks
        from fdt.models.shapes import trace_source_shapes
        shapes = trace_source_shapes(self.model, self.variables, height, width)
        priors = jnp.asarray(pyramid_face_priors(self.cfg, shapes, width, height))
        dcfg = dataclasses.replace(self.detect_cfg, conf_thresh=conf_thresh,
                                   nms_thresh=nms_thresh)

        from fdt.ops.quant import quantized

        @jax.jit
        def run(variables, images_u8):
            x = images_u8.astype(jnp.float32) - self._mean
            with jax.default_matmul_precision(self.precision), \
                 quantized(self.quant):
                if self.stem_impl == "s2d":
                    # precompute the stem via the exact s2d packing (stays
                    # float under int8 quant — bandwidth-, not MXU-bound)
                    c1 = _stem_s2d(variables, x, self.precision,
                                   self.model.dtype)
                    out = self.model.apply(variables, x, c1=c1)
                else:
                    out = self.model.apply(variables, x)
            assert out["source_shapes"] == tuple(shapes), (
                f"traced source shapes {out['source_shapes']} != predicted {shapes}")
            conf = jax.nn.softmax(out["face_conf"], axis=-1)
            return ssd_detect(out["face_loc"], conf, priors, dcfg, budget=self.budget)

        return run

    def detect_tensor(self, images_u8: np.ndarray, conf_thresh: float | None = None,
                      nms_thresh: float | None = None) -> np.ndarray:
        """[B,H,W,3] uint8 BGR → [B, 2, top_k, 5] detection tensor."""
        b, h, w, _ = images_u8.shape
        run = self._compiled(w, h,
                             self.detect_cfg.conf_thresh if conf_thresh is None else conf_thresh,
                             self.detect_cfg.nms_thresh if nms_thresh is None else nms_thresh)
        if self.mesh is not None:
            from fdt.dist import batch_sharding
            n = self.mesh.devices.size
            pad = -b % n
            if pad:  # replicate the last row up to a mesh multiple
                images_u8 = np.concatenate(
                    [images_u8, np.repeat(images_u8[-1:], pad, 0)])
            images_u8 = jax.device_put(images_u8, batch_sharding(self.mesh))
            return np.asarray(jax.device_get(
                run(self.variables, images_u8)))[:b]
        return np.asarray(jax.device_get(run(self.variables, images_u8)))

    def detect_face(self, image_bgr: np.ndarray, threshold: float,
                    shrink: float = 1.0, nms_thresh: float = 0.35) -> np.ndarray:
        """Single-image eval-protocol detection (My_test.py detect_face).

        Returns [N,5] rows [x1, y1, x2, y2, score] in (pre-shrink) pixel coords.
        """
        if shrink != 1.0:
            import cv2
            image_bgr = cv2.resize(image_bgr, None, None, fx=shrink, fy=shrink,
                                   interpolation=cv2.INTER_LINEAR)
        h, w, _ = image_bgr.shape
        det = self.detect_tensor(image_bgr[None], conf_thresh=threshold,
                                 nms_thresh=nms_thresh)[0]
        return detections_to_rows(det, threshold, [w, h, w, h], shrink)
