"""FaceBoxes network (NHWC flax).

Re-design of FACEBOX/networks.py:11-116 + FACEBOX/multibox_layer.py:12-50 for TPU:
a single fused NHWC conv graph whose multibox heads reshape directly to the
anchor-major [B, 21824, ·] layout (no permute/contiguous shuffles — NHWC already
matches the reference's post-permute order).

Input: [B, 1024, 1024, 3] float (BGR, /255-normalized as in My_test_facebox.py:15).
Output: loc [B, 21824, 4], conf [B, 21824, 2] (logits).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from fdt.models.common import ConvBNReLU, conv, crelu, max_pool


class Inception(nn.Module):
    """4-branch 128→128 inception block (FACEBOX/networks.py:25-57)."""
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x1 = ConvBNReLU(32, 1, name="conv1", dtype=d)(x, train)
        x2 = max_pool(x, 3, 1, 1)
        x2 = ConvBNReLU(32, 1, name="conv2", dtype=d)(x2, train)
        x3 = ConvBNReLU(24, 1, name="conv3", dtype=d)(x, train)
        x3 = ConvBNReLU(32, 3, padding=1, name="conv4", dtype=d)(x3, train)
        x4 = ConvBNReLU(24, 1, name="conv5", dtype=d)(x, train)
        x4 = ConvBNReLU(32, 3, padding=1, name="conv6", dtype=d)(x4, train)
        x4 = ConvBNReLU(32, 3, padding=1, name="conv7", dtype=d)(x4, train)
        return jnp.concatenate([x1, x2, x3, x4], axis=-1)


class MultiBoxHeads(nn.Module):
    """Per-source 3×3 loc/conf heads (FACEBOX/multibox_layer.py:12-50)."""
    num_anchors = (21, 1, 1)
    dtype: Any = None

    @nn.compact
    def __call__(self, xs):
        locs, confs = [], []
        for i, x in enumerate(xs):
            a = self.num_anchors[i]
            y_loc = conv(a * 4, 3, 1, 1, name=f"loc_layers__{i}", dtype=self.dtype)(x)
            y_conf = conv(a * 2, 3, 1, 1, name=f"conf_layers__{i}", dtype=self.dtype)(x)
            b = y_loc.shape[0]
            locs.append(y_loc.reshape(b, -1, 4))
            confs.append(y_conf.reshape(b, -1, 2))
        return jnp.concatenate(locs, 1), jnp.concatenate(confs, 1)


class FaceBox(nn.Module):
    """FaceBoxes: RDCL (CReLU stem) → 3×Inception → strided necks → multibox heads.

    setup-style (attribute names = the torch checkpoint's module names) so the
    MSCL trunk is separately callable: the TPU inference path replaces the RDCL
    stem with a space-to-depth rearrangement (fdt.infer.facebox._stem_s2d, same
    parameters) and resumes at `mscl` via apply(..., method="mscl")."""
    dtype: Any = None

    def setup(self):
        d = self.dtype
        self.conv1 = conv(24, 7, 4, 3, dtype=d)
        self.bn1 = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=d)
        self.conv2 = conv(64, 5, 2, 2, dtype=d)
        self.bn2 = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=d)
        self.inception1 = Inception(dtype=d)
        self.inception2 = Inception(dtype=d)
        self.inception3 = Inception(dtype=d)
        self.conv3_1 = ConvBNReLU(128, 1, dtype=d)
        self.conv3_2 = ConvBNReLU(256, 3, 2, 1, dtype=d)
        self.conv4_1 = ConvBNReLU(128, 1, dtype=d)
        self.conv4_2 = ConvBNReLU(256, 3, 2, 1, dtype=d)
        self.multilbox = MultiBoxHeads(dtype=d)

    def rdcl(self, x, train: bool = False):
        """Rapidly-digested conv layers (FACEBOX/networks.py:84-97)."""
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = self.conv1(x)
        x = self.bn1(x, use_running_average=not train)
        x = crelu(x)
        x = max_pool(x, 3, 2, 1)
        x = self.conv2(x)
        x = self.bn2(x, use_running_average=not train)
        x = crelu(x)
        return max_pool(x, 3, 2, 1)

    def mscl(self, x, train: bool = False):
        """Multi-scale conv layers + heads (FACEBOX/networks.py:99-116)."""
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = self.inception1(x, train)
        x = self.inception2(x, train)
        x = self.inception3(x, train)
        hs = [x]
        x = self.conv3_1(x, train)
        x = self.conv3_2(x, train)
        hs.append(x)
        x = self.conv4_1(x, train)
        x = self.conv4_2(x, train)
        hs.append(x)
        loc, conf = self.multilbox(hs)
        return loc.astype(jnp.float32), conf.astype(jnp.float32)

    def __call__(self, x, train: bool = False):
        return self.mscl(self.rdcl(x, train), train)
