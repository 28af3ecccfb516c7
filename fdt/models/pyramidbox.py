"""PyramidBox (S3FD + LFPN + SSH context + max-in-out) with a ResNet50 backbone.

TPU re-design of pyramid.py:11-374.  Differences from the reference by design:
  * NHWC layout end-to-end; head outputs reshape straight into prior-major
    [B, P, ·] tensors (the reference permutes NCHW activations per head).
  * pure function of its inputs: no `firstTime` prior caching, no phase switch —
    priors and test-time decode/NMS live in fdt.anchors / fdt.infer.
  * optional feature taps (`return_features`) replacing the net2net twin files
    (train_net2net/pyramid_train.py) — one model serves train/test/distill.

Flax module names mirror torch module paths so fdt.models.torch_convert can load
reference checkpoints (e.g. Res50_pyramid.pth) mechanically.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from fdt.models.common import (ContextTexture, SSHContext, batch_norm, conv,
                               max_in_out_conf, max_pool)


class Bottleneck(nn.Module):
    """ResNet50 bottleneck (pyramid.py:73-103)."""
    planes: int
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        p = self.planes
        out = nn.relu(batch_norm(name="bn1", train=train, dtype=d)(
            conv(p, 1, use_bias=False, name="conv1", dtype=d)(x)))
        out = nn.relu(batch_norm(name="bn2", train=train, dtype=d)(
            conv(p, 3, self.stride, 1, use_bias=False, name="conv2", dtype=d)(out)))
        out = batch_norm(name="bn3", train=train, dtype=d)(
            conv(4 * p, 1, use_bias=False, name="conv3", dtype=d)(out))
        if self.stride != 1 or x.shape[-1] != 4 * p:
            sc = conv(4 * p, 1, self.stride, use_bias=False, name="downsample__0", dtype=d)(x)
            sc = batch_norm(name="downsample__1", train=train, dtype=d)(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class _ExtraLayer(nn.Module):
    """conv1×1 → bn → relu → conv3×3/2 → bn → relu (pyramid.py:132-147).
    Child names follow torch Sequential indices (ReLUs occupy 2 and 5)."""
    mid: int
    out: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = nn.relu(batch_norm(name="1", train=train, dtype=d)(
            conv(self.mid, 1, name="0", dtype=d)(x)))
        x = nn.relu(batch_norm(name="4", train=train, dtype=d)(
            conv(self.out, 3, 2, 1, name="3", dtype=d)(x)))
        return x


class ResNetStage(nn.Module):
    num_blocks: int
    planes: int
    stride: int
    dtype: Any = None
    remat: bool = False  # per-Bottleneck nn.remat (see PyramidBox.remat)

    @nn.compact
    def __call__(self, x, train: bool = False):
        block = (nn.remat(Bottleneck, static_argnums=(2,)) if self.remat
                 else Bottleneck)
        for i in range(self.num_blocks):
            x = block(self.planes, self.stride if i == 0 else 1,
                      name=str(i), dtype=self.dtype)(x, train)
        return x


class PyramidBox(nn.Module):
    """Returns a dict:
      face_loc  [B, P, 4]        face_conf [B, P, 2] (logits, max-in-out applied)
      head_loc  [B, Ph, 4]       head_conf [B, Ph, 2] (logits)
      source_shapes: tuple of (f_width, f_height) per source (static)
      features / sources when return_features (net2net distillation taps,
        train_net2net/pyramid_train.py semantics)
    """
    num_blocks: Sequence[int] = (3, 4, 6, 3)
    dtype: Any = None
    return_features: bool = False
    # Segmented rematerialization: every Bottleneck / extra layer recomputes
    # its interior in the backward pass (nn.remat), so only block-BOUNDARY
    # activations stay live.  Unlike one jax.checkpoint around the whole
    # forward (whose backward re-materializes everything at once, saving
    # almost nothing — measured 0.95× temp for 1.2× step time), per-block
    # segmentation actually bounds live activation memory.  Param paths are
    # unchanged (nn.remat is structure-preserving), so checkpoints interop.
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, c1=None):
        d = self.dtype
        r = self.remat
        if d is not None:
            x = x.astype(d)
        # --- backbone (pyramid.py:229-236).  `c1` lets a caller substitute a
        # precomputed stem output (same params, rearranged compute): the TPU
        # inference path replaces the 7×7/2 direct conv — ~1% MXU utilization
        # at 3 input channels — with an exact space-to-depth packing
        # (fdt.infer.pyramidbox._stem_s2d) and resumes here at layer1.
        # conv1/bn1 params are registered either way (init never passes c1).
        if c1 is None:
            c1 = nn.relu(batch_norm(name="bn1", train=train, dtype=d)(
                conv(64, 7, 2, 3, use_bias=False, name="conv1", dtype=d)(x)))
            c1 = max_pool(c1, 3, 2, 1)
        elif d is not None:
            c1 = c1.astype(d)
        c2 = ResNetStage(self.num_blocks[0], 64, 1, name="layer1", dtype=d, remat=r)(c1, train)
        c3 = ResNetStage(self.num_blocks[1], 128, 2, name="layer2", dtype=d, remat=r)(c2, train)
        c4 = ResNetStage(self.num_blocks[2], 256, 2, name="layer3", dtype=d, remat=r)(c3, train)
        c5 = ResNetStage(self.num_blocks[3], 512, 2, name="layer4", dtype=d, remat=r)(c4, train)
        extra = (nn.remat(_ExtraLayer, static_argnums=(2,)) if r
                 else _ExtraLayer)
        c6 = extra(512, 512, name="layer5", dtype=d)(c5, train)
        c7 = extra(128, 256, name="layer6", dtype=d)(c6, train)

        # --- LFPN top-down fusion (pyramid.py:239-249)
        c5_lat = conv(2048, 1, name="latlayer_fc", dtype=d)(c5)
        c6_lat = conv(512, 1, name="latlayer_c6", dtype=d)(c6)
        c7_lat = conv(256, 1, name="latlayer_c7", dtype=d)(c7)

        c4_fuse = ContextTexture(1024, name="conv5_ct_py", dtype=d)(c5_lat, c4)
        c3_fuse = ContextTexture(512, name="conv4_ct_py", dtype=d)(c4_fuse, c3)
        c2_fuse = ContextTexture(256, name="conv3_ct_py", dtype=d)(c3_fuse, c2)

        c2_fuse = conv(256, 3, 1, 1, name="smooth_c3", dtype=d)(c2_fuse)
        c3_fuse = conv(512, 3, 1, 1, name="smooth_c4", dtype=d)(c3_fuse)
        c4_fuse = conv(1024, 3, 1, 1, name="smooth_c5", dtype=d)(c4_fuse)

        # --- SSH context modules (pyramid.py:255-266)
        sources = [
            SSHContext(256, name="conv2_SSH", dtype=d)(c2_fuse),
            SSHContext(256, name="conv3_SSH", dtype=d)(c3_fuse),
            SSHContext(256, name="conv4_SSH", dtype=d)(c4_fuse),
            SSHContext(256, name="conv5_SSH", dtype=d)(c5_lat),
            SSHContext(256, name="conv6_SSH", dtype=d)(c6_lat),
            SSHContext(256, name="conv7_SSH", dtype=d)(c7_lat),
        ]

        # --- face heads with max-in-out conf (pyramid.py:291-309)
        b = x.shape[0]
        locs, confs = [], []
        for i, s in enumerate(sources):
            tmp_conf = conv(4, 3, 1, 1, name=f"face_conf__{i}", dtype=d)(s)
            confs.append(max_in_out_conf(tmp_conf, first_source=(i == 0)).reshape(b, -1, 2))
            locs.append(conv(4, 3, 1, 1, name=f"face_loc__{i}", dtype=d)(s).reshape(b, -1, 4))
        face_loc = jnp.concatenate(locs, 1).astype(jnp.float32)
        face_conf = jnp.concatenate(confs, 1).astype(jnp.float32)

        # --- head-supervision branch over sources[1:] (pyramid.py:312-317)
        hlocs, hconfs = [], []
        for i, s in enumerate(sources[1:]):
            hlocs.append(conv(4, 3, 1, 1, name=f"head_loc__{i}", dtype=d)(s).reshape(b, -1, 4))
            hconfs.append(conv(2, 3, 1, 1, name=f"head_conf__{i}", dtype=d)(s).reshape(b, -1, 2))
        head_loc = jnp.concatenate(hlocs, 1).astype(jnp.float32)
        head_conf = jnp.concatenate(hconfs, 1).astype(jnp.float32)

        out = {
            "face_loc": face_loc, "face_conf": face_conf,
            "head_loc": head_loc, "head_conf": head_conf,
            "source_shapes": tuple((s.shape[2], s.shape[1]) for s in sources),
        }
        if self.return_features:
            out["features"] = [c2, c3, c4, c5, c6, c7]
            out["sources"] = sources
        return out
