"""End-to-end jitted FaceBoxes inference.

Reference pipeline (FACEBOX/My_test_facebox.py:12-36): cv2 resize to 1024² →
/255 → forward → softmax → decode_np (numpy decode + greedy NMS on host).
Here everything after the resize is ONE jitted graph on device — normalization,
conv forward, softmax, decode and NMS — batched over images and shardable over
the mesh batch axis.  uint8 pixels cross PCIe; floats never do.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from fdt.anchors import facebox_default_boxes
from fdt.config import FACEBOX, FaceBoxConfig
from fdt.geometry import decode
from fdt.geometry.nms import nms_padded
from fdt.models.facebox import FaceBox


class FaceBoxDetector:
    """Holds converted params and a jit-compiled batched detect function."""

    def __init__(self, variables, cfg: FaceBoxConfig = FACEBOX,
                 budget: int = 2048, out_k: int = 750, dtype=None,
                 precision: str = "highest"):
        self.cfg = cfg
        self.model = FaceBox(dtype=dtype)
        self.variables = variables
        self.budget = budget
        self.out_k = out_k
        self.precision = precision
        self._default_boxes = jnp.asarray(facebox_default_boxes(cfg))
        self._detect = jax.jit(self._detect_impl)

    def _detect_impl(self, variables, images_u8):
        """images_u8: [B, S, S, 3] uint8 BGR → (boxes [B,K,4] normalized,
        scores [B,K], count [B])."""
        x = images_u8.astype(jnp.float32) / 255.0
        with jax.default_matmul_precision(self.precision):
            loc, conf = self.model.apply(variables, x)
        probs = jax.nn.softmax(conf, axis=-1)[..., 1]          # [B, P]
        boxes = decode(loc, self._default_boxes, self.cfg.variance)  # [B, P, 4]

        def one(b, s):
            valid = s > self.cfg.conf_thresh
            idx, count = nms_padded(b, s, self.cfg.nms_thresh,
                                    budget=self.budget, out_k=self.out_k,
                                    valid=valid)
            keep = jnp.arange(self.out_k) < count
            return (jnp.where(keep[:, None], b[idx], 0.0),
                    jnp.where(keep, s[idx], 0.0), count)

        return jax.vmap(one)(boxes, probs)

    def detect_batch(self, images_u8: np.ndarray):
        """[B,1024,1024,3] uint8 BGR → list of (boxes [n,4] normalized, scores [n])."""
        boxes, scores, count = jax.device_get(self._detect(self.variables, images_u8))
        return [(boxes[i, :c], scores[i, :c]) for i, c in enumerate(np.asarray(count))]

    def detect(self, image_bgr: np.ndarray):
        """Single image at any resolution (host cv2 resize like the reference).

        Returns (boxes [n,4] in original pixel coords, scores [n]).
        """
        import cv2
        h, w = image_bgr.shape[:2]
        s = self.cfg.input_size
        im = cv2.resize(image_bgr, (s, s))
        (boxes, scores), = self.detect_batch(im[None])
        return boxes * np.array([w, h, w, h], np.float32), scores
