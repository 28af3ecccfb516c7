"""PyramidBox mobile variants (try1…try5) — NHWC flax.

Five backbone-simplified PyramidBox variants from the reference:
  try1  hand-built MobileNet trunk mimicking the ResNet50 channel plan
        (pyramid_mobile_try1.py:83-220)
  try2  thin 64/128/256/512 trunk + per-stage 1×1 channel expanders
        (pyramid_mobile_try2.py:141-233)
  try3  stock MobileNetV2 `features` tapped at 4 stages + extra S64 block,
        5 source maps, SSDLite-style 128-channel SSH (pyramid_mb2_try3.py:137-216)
  try4  try3 with a 7×7/pad-1 stem and InvertedResidual-augmented smooths
        (pyramid_mb2_try4.py:16,184-191)
  try5  try4 with the 3×3 stem and 3×3 smooth_c5 restored (pyramid_mb2_try5.py diff)

Module names mirror torch paths ('__' spells '.') for mechanical checkpoint
conversion.  All variants emit the same output schema as fdt.models.pyramidbox.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from fdt.models.common import (ContextTexture, SSHContext, batch_norm, conv,
                               max_in_out_conf, max_pool)


class MobileNetV1Block(nn.Module):
    """Depthwise-separable conv: dw → bn → relu → pw (pyramid_mobile_try1.py:83-97).
    torch children: conv1 (dw), bn, conv2 (pw)."""
    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    use_bias: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        x = conv(c, self.kernel, self.stride, self.padding, dilation=self.dilation,
                 groups=c, use_bias=self.use_bias, name="conv1", dtype=self.dtype)(x)
        x = batch_norm(name="bn", train=train, dtype=self.dtype)(x)
        x = nn.relu(x)
        return conv(self.features, 1, use_bias=False, name="conv2", dtype=self.dtype)(x)


class MobileNetV2Block(nn.Module):
    """Inverted residual: pw-expand → dw → pw-linear, optional skip
    (pyramid_mobile_try1.py:101-136).  torch children conv1/bn1..conv3/bn3."""
    features: int
    t: int = 2
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    side_way: bool = False
    use_bias: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        hidden = x.shape[-1] * self.t
        ori = x
        x = conv(hidden, 1, use_bias=False, name="conv1", dtype=d)(x)
        x = nn.relu6(batch_norm(name="bn1", train=train, dtype=d)(x))
        x = conv(hidden, self.kernel, self.stride, self.padding, groups=hidden,
                 dilation=self.dilation, use_bias=self.use_bias, name="conv2", dtype=d)(x)
        x = nn.relu6(batch_norm(name="bn2", train=train, dtype=d)(x))
        x = conv(self.features, 1, use_bias=False, name="conv3", dtype=d)(x)
        x = batch_norm(name="bn3", train=train, dtype=d)(x)
        if self.side_way:
            x = x + ori
        return x


class InvertedResidual(nn.Module):
    """Stock MobileNetV2 inverted residual (pyramid_mb2_try3.py:73-134).
    torch child: 'conv' Sequential — indices 0/1/3/4(/6/7)."""
    features: int
    stride: int
    expand_ratio: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        inp = x.shape[-1]
        hidden = round(inp * self.expand_ratio)
        use_res = self.stride == 1 and inp == self.features
        y = x
        if self.expand_ratio == 1:
            y = conv(hidden, 3, self.stride, 1, groups=hidden, use_bias=False,
                     name="conv__0", dtype=d)(y)
            y = nn.relu6(batch_norm(name="conv__1", train=train, dtype=d)(y))
            y = conv(self.features, 1, use_bias=False, name="conv__3", dtype=d)(y)
            y = batch_norm(name="conv__4", train=train, dtype=d)(y)
        else:
            y = conv(hidden, 1, use_bias=False, name="conv__0", dtype=d)(y)
            y = nn.relu6(batch_norm(name="conv__1", train=train, dtype=d)(y))
            y = conv(hidden, 3, self.stride, 1, groups=hidden, use_bias=False,
                     name="conv__3", dtype=d)(y)
            y = nn.relu6(batch_norm(name="conv__4", train=train, dtype=d)(y))
            y = conv(self.features, 1, use_bias=False, name="conv__6", dtype=d)(y)
            y = batch_norm(name="conv__7", train=train, dtype=d)(y)
        return x + y if use_res else y


def _heads(sources, b, dtype, prefix_loc="face_loc", prefix_conf="face_conf"):
    """Max-in-out face heads shared by all variants (pyramid.py:291-309)."""
    locs, confs = [], []
    for i, s in enumerate(sources):
        tmp = conv(4, 3, 1, 1, name=f"{prefix_conf}__{i}", dtype=dtype)(s)
        confs.append(max_in_out_conf(tmp, first_source=(i == 0)).reshape(b, -1, 2))
        locs.append(conv(4, 3, 1, 1, name=f"{prefix_loc}__{i}", dtype=dtype)(s).reshape(b, -1, 4))
    return (jnp.concatenate(locs, 1).astype(jnp.float32),
            jnp.concatenate(confs, 1).astype(jnp.float32))


def _head_branch(sources_tail, b, dtype):
    hlocs, hconfs = [], []
    for i, s in enumerate(sources_tail):
        hlocs.append(conv(4, 3, 1, 1, name=f"head_loc__{i}", dtype=dtype)(s).reshape(b, -1, 4))
        hconfs.append(conv(2, 3, 1, 1, name=f"head_conf__{i}", dtype=dtype)(s).reshape(b, -1, 2))
    return (jnp.concatenate(hlocs, 1).astype(jnp.float32),
            jnp.concatenate(hconfs, 1).astype(jnp.float32))


def _output(sources, face_loc, face_conf, head_loc, head_conf,
            features=None, return_features=False):
    out = {"face_loc": face_loc, "face_conf": face_conf,
           "head_loc": head_loc, "head_conf": head_conf,
           "source_shapes": tuple((s.shape[2], s.shape[1]) for s in sources)}
    if return_features:
        out["features"] = features
        out["sources"] = sources
    return out


class PyramidBoxMobileV1(nn.Module):
    """try1/try2: hand-built MobileNet trunks with the full 6-source PyramidBox
    neck (pyramid_mobile_try1.py:139-220, pyramid_mobile_try2.py:141-233)."""
    variant: str = "try1"
    dtype: Any = None
    return_features: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        if d is not None:
            x = x.astype(d)
        t2 = self.variant == "try2"

        def M2(*args, **kw):
            return lambda name: MobileNetV2Block(*args, name=name, **kw)

        def seq(name, blocks):
            def run(h):
                for i, make in enumerate(blocks):
                    h = make(f"{name}__{i}")(h, train)
                return h
            return run

        c1 = MobileNetV1Block(64, 7, 2, 3, name="conv1_my", dtype=d)(x, train)
        c1 = nn.relu(batch_norm(name="bn1", train=train, dtype=d)(c1))
        c1 = max_pool(c1, 3, 2, 1)

        if not t2:  # try1 (t=2 everywhere, pyramid_mobile_try1.py:160-179)
            c2 = seq("layer1_my", [M2(64, 2, side_way=True, dtype=d),
                                   M2(64, 2, side_way=True, dtype=d),
                                   M2(256, 2, dtype=d)])(c1)
            c3 = seq("layer2_my", [M2(64, 2, 5, 2, 2, dtype=d),
                                   M2(512, 2, 3, 1, 2, dilation=2, dtype=d)])(c2)
            c4 = seq("layer3_my", [M2(256, 2, 5, 2, 2, dtype=d),
                                   M2(256, 2, 5, 1, 2, side_way=True, dtype=d),
                                   M2(1024, 2, 3, 1, 2, dilation=2, dtype=d)])(c3)
            c5 = seq("layer4_my", [M2(256, 2, 5, 2, 2, dtype=d),
                                   M2(2048, 2, 3, 1, 1, dtype=d)])(c4)
            c6 = MobileNetV2Block(512, 2, 3, 2, name="layer5_my", dtype=d)(c5, train)
            c7 = MobileNetV2Block(256, 2, 3, 2, name="layer6_my", dtype=d)(c6, train)
            smooth_bias = False
        else:       # try2 (t=4 default, adj expanders, pyramid_mobile_try2.py:163-193)
            c2 = seq("layer1_my", [M2(64, 4, side_way=True, dtype=d)] * 3)(c1)
            c3 = seq("layer2_my", [M2(64, 4, 3, 2, dtype=d),
                                   M2(64, 4, side_way=True, dtype=d),
                                   M2(64, 4, side_way=True, dtype=d),
                                   M2(128, 4, dtype=d)])(c2)
            c4 = seq("layer3_my", [M2(128, 2, 3, 2, dtype=d),
                                   M2(128, 2, side_way=True, dtype=d),
                                   M2(128, 2, side_way=True, dtype=d),
                                   M2(128, 2, side_way=True, dtype=d),
                                   M2(128, 2, side_way=True, dtype=d),
                                   M2(256, 2, dtype=d)])(c3)
            c5 = seq("layer4_my", [M2(256, 4, 3, 2, dtype=d),
                                   M2(256, 4, side_way=True, dtype=d),
                                   M2(512, 4, dtype=d)])(c4)
            c6 = MobileNetV2Block(512, 4, 3, 2, use_bias=True, name="layer5_my", dtype=d)(c5, train)
            c7 = MobileNetV2Block(256, 4, 3, 2, use_bias=True, name="layer6_my", dtype=d)(c6, train)
            c2 = conv(256, 1, use_bias=False, name="layer1_adj", dtype=d)(c2)
            c3 = conv(512, 1, use_bias=False, name="layer2_adj", dtype=d)(c3)
            c4 = conv(1024, 1, use_bias=False, name="layer3_adj", dtype=d)(c4)
            c5 = conv(2048, 1, use_bias=False, name="layer4_adj", dtype=d)(c5)
            smooth_bias = True

        # LFPN with grouped lateral 1×1s (try1:185-191, try2:199-205)
        c5_lat = conv(2048, 1, groups=4, name="latlayer_fc_my", dtype=d)(c5)
        c6_lat = conv(512, 1, groups=2, name="latlayer_c6_my", dtype=d)(c6)
        c7_lat = conv(256, 1, groups=1, name="latlayer_c7_my", dtype=d)(c7)

        c4_fuse = ContextTexture(1024, name="conv5_ct_py", dtype=d)(c5_lat, c4)
        c3_fuse = ContextTexture(512, name="conv4_ct_py", dtype=d)(c4_fuse, c3)
        c2_fuse = ContextTexture(256, name="conv3_ct_py", dtype=d)(c3_fuse, c2)

        c2_fuse = MobileNetV1Block(256, 3, 1, 1, use_bias=smooth_bias,
                                   name="smooth_c3_my", dtype=d)(c2_fuse, train)
        c3_fuse = MobileNetV1Block(512, 3, 1, 1, use_bias=smooth_bias,
                                   name="smooth_c4_my", dtype=d)(c3_fuse, train)
        c4_fuse = MobileNetV1Block(1024, 3, 1, 1, use_bias=smooth_bias,
                                   name="smooth_c5_my", dtype=d)(c4_fuse, train)

        sources = [
            SSHContext(256, name="conv2_SSH", dtype=d)(c2_fuse),
            SSHContext(256, name="conv3_SSH", dtype=d)(c3_fuse),
            SSHContext(256, name="conv4_SSH", dtype=d)(c4_fuse),
            SSHContext(256, name="conv5_SSH", dtype=d)(c5_lat),
            SSHContext(256, name="conv6_SSH", dtype=d)(c6_lat),
            SSHContext(256, name="conv7_SSH", dtype=d)(c7_lat),
        ]
        b = x.shape[0]
        face_loc, face_conf = _heads(sources, b, d)
        head_loc, head_conf = _head_branch(sources[1:], b, d)
        return _output(sources, face_loc, face_conf, head_loc, head_conf,
                       [c2, c3, c4, c5, c6, c7], self.return_features)


# MobileNetV2 cfgs table (pyramid_mb2_try3.py:150-159)
_MB2_CFGS = [
    (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
    (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
]


class PyramidBoxMobileV2(nn.Module):
    """try3/try4/try5: stock MobileNetV2 backbone, 5 source maps, 128-ch SSH."""
    variant: str = "try3"
    dtype: Any = None
    return_features: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        if d is not None:
            x = x.astype(d)
        v = self.variant
        stem_k = 7 if v == "try4" else 3  # 7×7/pad-1 stem quirk (try4.py:16)

        # features.0 = conv_bn stem; features.1.. = inverted residuals
        h = conv(32, stem_k, 2, 1, use_bias=False, name="features__0__0", dtype=d)(x)
        h = nn.relu6(batch_norm(name="features__0__1", train=train, dtype=d)(h))
        idx = 1
        taps = {}
        for t, c, n, s in _MB2_CFGS:
            for i in range(n):
                h = InvertedResidual(c, s if i == 0 else 1, t,
                                     name=f"features__{idx}", dtype=d)(h, train)
                idx += 1
            taps[idx - 1] = h
        c2, c3, c4, c5 = taps[3], taps[6], taps[13], taps[17]
        c6 = InvertedResidual(160, 2, 6, name="layer6", dtype=d)(c5, train)

        # LFPN (try3:242-251); try4/5 smooth quirks (try4.py:184-191)
        if v == "try4":
            c6 = conv(160, 1, 1, 1, name="smooth_c6", dtype=d)(c6)
            c5 = conv(320, 1, 1, 1, name="smooth_c5", dtype=d)(c5)
        elif v == "try5":
            c6 = conv(160, 1, 1, 1, name="smooth_c6", dtype=d)(c6)
            c5 = conv(320, 3, 1, 1, name="smooth_c5", dtype=d)(c5)
        else:
            c6 = conv(160, 3, 1, 1, name="smooth_c6", dtype=d)(c6)
            c5 = conv(320, 3, 1, 1, name="smooth_c5", dtype=d)(c5)

        c4 = ContextTexture(96, name="conv4_ct_py", dtype=d)(c5, c4)
        c3 = ContextTexture(32, name="conv3_ct_py", dtype=d)(c4, c3)
        c2 = ContextTexture(24, name="conv2_ct_py", dtype=d)(c3, c2)

        if v in ("try4", "try5"):
            def smooth(name, ch, t, h):
                h = InvertedResidual(ch, 1, t, name=f"{name}__0", dtype=d)(h, train)
                return conv(ch, 3, 1, 1, name=f"{name}__1", dtype=d)(h)
            c2 = smooth("smooth_c2", 24, 4, c2)
            c3 = smooth("smooth_c3", 32, 4, c3)
            c4 = smooth("smooth_c4", 96, 2, c4)
        else:
            c2 = conv(24, 3, 1, 1, name="smooth_c2", dtype=d)(c2)
            c3 = conv(32, 3, 1, 1, name="smooth_c3", dtype=d)(c3)
            c4 = conv(96, 3, 1, 1, name="smooth_c4", dtype=d)(c4)

        sources = [
            SSHContext(128, name="conv2_SSH", dtype=d)(c2),
            SSHContext(128, name="conv3_SSH", dtype=d)(c3),
            SSHContext(128, name="conv4_SSH", dtype=d)(c4),
            SSHContext(128, name="conv5_SSH", dtype=d)(c5),
            SSHContext(128, name="conv6_SSH", dtype=d)(c6),
        ]
        b = x.shape[0]
        face_loc, face_conf = _heads(sources, b, d)
        head_loc, head_conf = _head_branch(sources[1:], b, d)
        return _output(sources, face_loc, face_conf, head_loc, head_conf,
                       [c2, c3, c4, c5, c6], self.return_features)


def build_pyramidbox(variant: str, dtype=None, return_features: bool = False,
                     remat: bool = False):
    """Builder covering the whole family (reference build_sfd / build_sfd_mobile).

    remat: per-block segmented rematerialization (flagship only — the mobile
    variants' activations are small enough that remat only costs time)."""
    from fdt.models.pyramidbox import PyramidBox
    if variant == "repo":
        return PyramidBox(dtype=dtype, return_features=return_features,
                          remat=remat)
    if remat:
        raise ValueError("remat is only wired for the 'repo' flagship")
    if variant in ("try1", "try2"):
        return PyramidBoxMobileV1(variant=variant, dtype=dtype,
                                  return_features=return_features)
    if variant in ("try3", "try4", "try5"):
        return PyramidBoxMobileV2(variant=variant, dtype=dtype,
                                  return_features=return_features)
    raise ValueError(f"unknown PyramidBox variant: {variant}")
