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
from fdt.ops.s2d import (conv_valid_batched, pad_cells, space_to_depth,
                         strided_s2d_kernel)


def _stem_s2d(variables, x, precision):
    """FaceBox RDCL stem with space-to-depth strided convs (same params).

    conv1 (7×7/4, 3→24 over 1024²) and conv2 (5×5/2, 48→64) run at ~1% MXU
    utilization as direct convs (channel dims pad to 128 lanes); packing the
    stride's spatial phases into channels turns them into K=192 / K=768
    contractions at 1/16 and 1/4 the spatial extent.  Exact rearrangement —
    same taps and products as FaceBox.rdcl (bounded by tests/test_facebox.py).
    """
    from fdt.models.common import crelu, max_pool

    p, bs = variables["params"], variables["batch_stats"]

    def bn(y, name):
        # inference BatchNorm; eps matches fdt.models.common.batch_norm (1e-5)
        g, b = p[name]["scale"], p[name]["bias"]
        mu, var = bs[name]["mean"], bs[name]["var"]
        return g * (y - mu) * jax.lax.rsqrt(var + 1e-5) + b

    def pool(y):
        return max_pool(y, 3, 2, 1)

    h, w = x.shape[1], x.shape[2]
    oh, ow = (h + 6 - 7) // 4 + 1, (w + 6 - 7) // 4 + 1
    y = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))     # conv1's own padding
    y = space_to_depth(pad_cells(y, 4), 4)
    y = conv_valid_batched(y, strided_s2d_kernel(p["conv1"]["kernel"], 4),
                           precision)[:, :oh, :ow] + p["conv1"]["bias"]
    y = pool(crelu(bn(y, "bn1")))

    h2, w2 = y.shape[1], y.shape[2]
    oh2, ow2 = (h2 + 4 - 5) // 2 + 1, (w2 + 4 - 5) // 2 + 1
    y = jnp.pad(y, ((0, 0), (2, 2), (2, 2), (0, 0)))     # conv2's own padding
    y = space_to_depth(pad_cells(y, 2), 2)
    y = conv_valid_batched(y, strided_s2d_kernel(p["conv2"]["kernel"], 2),
                           precision)[:, :oh2, :ow2] + p["conv2"]["bias"]
    return pool(crelu(bn(y, "bn2")))


class FaceBoxDetector:
    """Holds converted params and a jit-compiled batched detect function."""

    def __init__(self, variables, cfg: FaceBoxConfig = FACEBOX,
                 budget: int = 2048, out_k: int = 750, dtype=None,
                 precision: str = "highest", stem_impl: str | None = None,
                 quant: str | None = None, mesh=None):
        self.cfg = cfg
        self.model = FaceBox(dtype=dtype)
        # opt-in int8 post-training quantization of the model convs (the s2d
        # stem, when active, stays float — it is bandwidth-, not MXU-bound)
        self.quant = quant
        # mesh: optional data-parallel batched inference, same contract as
        # PyramidBoxDetector(mesh=...): params replicate, detect_batch shards
        # over the `data` axis (batch padded to a mesh multiple), results
        # equal the unsharded detector (batch elements are independent)
        self.mesh = mesh
        if mesh is not None:
            from fdt.dist import replicated
            variables = jax.device_put(variables, replicated(mesh))
        # stage params on device ONCE: torch-converted checkpoints arrive as
        # host numpy, and passing those to a jitted call re-uploads ~4MB per
        # step — which over this environment's slow PCIe-tunnel measured 6x
        # slower than the conv graph itself
        self.variables = jax.device_put(variables)
        self.budget = budget
        self.out_k = out_k
        self.precision = precision
        # space-to-depth stem rides the MXU; the direct convs win on CPU.
        # A pinned default device wins over the default backend (test envs
        # pin CPU while a TPU plugin is present).
        if stem_impl is None:
            from fdt.utils.devices import default_platform
            stem_impl = ("s2d" if default_platform() == "tpu"
                         and dtype is None else "direct")
        self.stem_impl = stem_impl
        self._default_boxes = jnp.asarray(facebox_default_boxes(cfg))
        self._detect = jax.jit(self._detect_impl)

    def _detect_impl(self, variables, images_u8):
        """images_u8: [B, S, S, 3] uint8 BGR → (boxes [B,K,4] normalized,
        scores [B,K], count [B])."""
        from fdt.ops.quant import quantized
        x = images_u8.astype(jnp.float32) / 255.0
        with jax.default_matmul_precision(self.precision), \
             quantized(self.quant):
            if self.stem_impl == "s2d":
                feats = _stem_s2d(variables, x, self.precision)
                loc, conf = self.model.apply(variables, feats, method="mscl")
            else:
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
        b = len(images_u8)
        if self.mesh is not None:
            from fdt.dist import batch_sharding
            pad = -b % self.mesh.devices.size
            if pad:
                images_u8 = np.concatenate(
                    [images_u8, np.repeat(images_u8[-1:], pad, 0)])
            images_u8 = jax.device_put(images_u8, batch_sharding(self.mesh))
        boxes, scores, count = jax.device_get(self._detect(self.variables, images_u8))
        return [(boxes[i, :c], scores[i, :c])
                for i, c in enumerate(np.asarray(count)[:b])]

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
