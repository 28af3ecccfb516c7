"""MTCNN cascade networks (PNet / RNet / ONet) — NHWC flax.

Re-design of MTCNN/mtcnn/core/models.py:72-234.  PNet is fully convolutional
(applied to whole pyramid levels); RNet/ONet take fixed 24²/48² crops.  The
torch nets flatten NCHW before their first Linear; our NHWC flatten differs in
element order, so the checkpoint converter permutes those Linear weights
(see mtcnn_linear_transforms).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from fdt.models.common import conv


def _prelu(x, name):
    return nn.PReLU(name=name)(x)


def _pool(x, k, s):
    """torch MaxPool2d(k, s) — no padding, floor output size."""
    return nn.max_pool(x, (k, k), strides=(s, s), padding="VALID")


class PNet(nn.Module):
    """12×12-receptive-field proposal FCN (models.py:72-119).
    Returns (sigmoid cls map [B,H',W',1], reg map [B,H',W',4])."""
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        if d is not None:
            x = x.astype(d)
        x = _prelu(conv(10, 3, name="pre_layer__0", dtype=d)(x), "pre_layer__1")
        x = _pool(x, 2, 2)
        x = _prelu(conv(16, 3, name="pre_layer__3", dtype=d)(x), "pre_layer__4")
        x = _prelu(conv(32, 3, name="pre_layer__5", dtype=d)(x), "pre_layer__6")
        label = nn.sigmoid(conv(1, 1, name="conv4_1", dtype=d)(x))
        offset = conv(4, 1, name="conv4_2", dtype=d)(x)
        return label.astype(jnp.float32), offset.astype(jnp.float32)


class RNet(nn.Module):
    """24×24 refinement net (models.py:122-176): (cls [B,1], reg [B,4])."""
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        if d is not None:
            x = x.astype(d)
        x = _prelu(conv(28, 3, name="pre_layer__0", dtype=d)(x), "pre_layer__1")
        x = _pool(x, 3, 2)
        x = _prelu(conv(48, 3, name="pre_layer__3", dtype=d)(x), "pre_layer__4")
        x = _pool(x, 3, 2)
        x = _prelu(conv(64, 2, name="pre_layer__6", dtype=d)(x), "pre_layer__7")
        x = x.reshape(x.shape[0], -1)          # NHWC flatten (converter permutes)
        x = _prelu(nn.Dense(128, name="conv4", dtype=d)(x), "prelu4")
        det = nn.sigmoid(nn.Dense(1, name="conv5_1", dtype=d)(x))
        box = nn.Dense(4, name="conv5_2", dtype=d)(x)
        return det.astype(jnp.float32), box.astype(jnp.float32)


class ONet(nn.Module):
    """48×48 output net (models.py:179-234): (cls [B,1], reg [B,4], landmarks [B,10])."""
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        if d is not None:
            x = x.astype(d)
        x = _prelu(conv(32, 3, name="pre_layer__0", dtype=d)(x), "pre_layer__1")
        x = _pool(x, 3, 2)
        x = _prelu(conv(64, 3, name="pre_layer__3", dtype=d)(x), "pre_layer__4")
        x = _pool(x, 3, 2)
        x = _prelu(conv(64, 3, name="pre_layer__6", dtype=d)(x), "pre_layer__7")
        x = _pool(x, 2, 2)
        x = _prelu(conv(128, 2, name="pre_layer__9", dtype=d)(x), "pre_layer__10")
        x = x.reshape(x.shape[0], -1)
        x = _prelu(nn.Dense(256, name="conv5", dtype=d)(x), "prelu5")
        det = nn.sigmoid(nn.Dense(1, name="conv6_1", dtype=d)(x))
        box = nn.Dense(4, name="conv6_2", dtype=d)(x)
        landmark = nn.Dense(10, name="conv6_3", dtype=d)(x)
        return det.astype(jnp.float32), box.astype(jnp.float32), landmark.astype(jnp.float32)


def mtcnn_linear_transforms(net: str, inverse: bool = False):
    """Per-checkpoint fixups: torch flattens NCHW before the first Linear; our
    NHWC flatten needs the weight columns permuted (C,H,W) → (H,W,C).
    inverse=True gives the export-side fixup (flax_to_torch)."""
    spec = {"rnet": ("conv4.weight", 64, 2, 2),
            "onet": ("conv5.weight", 128, 2, 2)}.get(net)
    if spec is None:
        return {}
    key, c, h, w = spec

    def fix(weight):  # torch (out, C*H*W) → (out, H*W*C)
        out = weight.shape[0]
        return weight.reshape(out, c, h, w).transpose(0, 2, 3, 1).reshape(out, -1)

    def unfix(weight):  # (out, H*W*C) → torch (out, C*H*W)
        out = weight.shape[0]
        return weight.reshape(out, h, w, c).transpose(0, 3, 1, 2).reshape(out, -1)

    return {key: unfix if inverse else fix}


def mtcnn_export_extras(net: str):
    """Zero-filled entries for the reference nets' DEAD landmark heads —
    defined but commented out of forward (PNet.conv4_3 / RNet.conv5_3,
    MTCNN/mtcnn/core/models.py:100,111 and :152,169) — which a strict torch
    load_state_dict still demands.  Behaviorally inert (never executed)."""
    shapes = {"pnet": {"conv4_3.weight": (10, 32, 1, 1), "conv4_3.bias": (10,)},
              "rnet": {"conv5_3.weight": (10, 128), "conv5_3.bias": (10,)}}
    return {k: np.zeros(s, np.float32)
            for k, s in shapes.get(net, {}).items()}
