"""Shared flax building blocks for the model zoo.

All models are NHWC (TPU-native layout) and bf16-capable via the `dtype`
attribute; parameters stay fp32.  Module *names* mirror the reference's torch
module paths (including Sequential indices, using `__` for torch's `.`), which
makes checkpoint conversion in fdt.models.torch_convert fully mechanical.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def pad2d(p) -> Sequence[tuple[int, int]]:
    if isinstance(p, int):
        return ((p, p), (p, p))
    return tuple((int(a), int(a)) for a in p)


def conv(features, kernel, stride=1, padding=0, *, name=None, use_bias=True,
         groups=1, dilation=1, dtype=None):
    """nn.Conv with torch-style integer padding/dilation.

    Inside a `fdt.ops.quant.quantized("int8")` context (read at trace time)
    this returns Int8Conv instead — same parameter structure, int8 MXU
    contraction — which is how detectors' opt-in quantized inference reaches
    every conv in the zoo without touching the model definitions.
    """
    k = (kernel, kernel) if isinstance(kernel, int) else kernel
    s = (stride, stride) if isinstance(stride, int) else stride
    d = (dilation, dilation) if isinstance(dilation, int) else dilation
    from fdt.ops.quant import Int8Conv, quant_mode
    if quant_mode() == "int8":
        return Int8Conv(features, k, strides=s, padding=pad2d(padding),
                        use_bias=use_bias, feature_group_count=groups,
                        kernel_dilation=d, name=name, dtype=dtype)
    return nn.Conv(features, k, strides=s, padding=pad2d(padding),
                   use_bias=use_bias, feature_group_count=groups,
                   kernel_dilation=d, name=name, dtype=dtype)


def batch_norm(*, name=None, train=False, dtype=None):
    """BatchNorm matching torch defaults (eps 1e-5, momentum 0.1 → flax 0.9)."""
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name, dtype=dtype)


def max_pool(x, kernel=3, stride=2, padding=1):
    """torch MaxPool2d semantics (implicit -inf padding)."""
    k = (kernel, kernel)
    s = (stride, stride)
    return nn.max_pool(x, k, strides=s, padding=pad2d(padding))


def crelu(x):
    """Concatenated ReLU: relu(cat[x, -x]) along channels (FACEBOX/networks.py:92)."""
    return nn.relu(jnp.concatenate([x, -x], axis=-1))


class ConvBNReLU(nn.Module):
    """Sequential(Conv, BatchNorm, ReLU) — children named '0'/'1' to mirror
    the reference's conv_bn_relu (FACEBOX/networks.py:11-16)."""
    features: int
    kernel: int
    stride: int = 1
    padding: int = 0
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv(self.features, self.kernel, self.stride, self.padding,
                 name="0", dtype=self.dtype)(x)
        x = batch_norm(name="1", train=train, dtype=self.dtype)(x)
        return nn.relu(x)


class ConvBN(nn.Module):
    """Conv + BN (+ optional ReLU) with semantic child names ('conv'/'bn'),
    mirroring pyramid.py:11-23 ConvBN."""
    features: int
    kernel: int = 1
    stride: int = 1
    padding: int = 0
    relu: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv(self.features, self.kernel, self.stride, self.padding,
                 name="conv", dtype=self.dtype)(x)
        x = batch_norm(name="bn", train=train, dtype=self.dtype)(x)
        if self.relu:
            x = nn.relu(x)
        return x


class SSHContext(nn.Module):
    """SSH context module: 3×3 ‖ (dilated 3×3 → 3×3) ‖ (dilated → dilated → 3×3),
    concat to 2*xchannels.  Reference: pyramid.py:26-48."""
    xchannels: int = 256
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        xc = self.xchannels
        x1 = nn.relu(conv(xc, 3, 1, 1, name="conv1", dtype=self.dtype)(x))
        x2 = nn.relu(conv(xc // 2, 3, 1, 2, dilation=2, name="conv2", dtype=self.dtype)(x))
        x2_1 = nn.relu(conv(xc // 2, 3, 1, 1, name="conv2_1", dtype=self.dtype)(x2))
        x2_2 = nn.relu(conv(xc // 2, 3, 1, 2, dilation=2, name="conv2_2", dtype=self.dtype)(x2))
        x2_2 = nn.relu(conv(xc // 2, 3, 1, 1, name="conv2_2_1", dtype=self.dtype)(x2_2))
        return jnp.concatenate([x1, x2_1, x2_2], axis=-1)


class ContextTexture(nn.Module):
    """LFPN top-down fusion: 1×1 convs + 2× bilinear upsample + crop + add.
    Reference: pyramid.py:51-69."""
    main_channels: int
    dtype: Dtype = None

    @nn.compact
    def __call__(self, up, main):
        up = conv(self.main_channels, 1, name="up_conv", dtype=self.dtype)(up)
        main = conv(self.main_channels, 1, name="main_conv", dtype=self.dtype)(main)
        # F.interpolate(scale_factor=2, mode='bilinear', align_corners=False)
        res = _upsample_bilinear_x2(up)
        mh, mw = main.shape[1], main.shape[2]
        res = res[:, :mh, :mw, :]
        return res + main


def _upsample_bilinear_x2(x):
    """2× bilinear upsample with half-pixel centers (torch align_corners=False).

    jax.image.resize(method='linear') uses the same half-pixel convention.
    """
    import jax
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="linear")


class L2Norm(nn.Module):
    """Channelwise L2 normalization with a learnable scale.

    Reference: layers/modules/l2norm.py:7-24 (exported by the reference's layer
    package; not wired into the active models, provided for parity).
    """
    scale_init: float = 20.0
    eps: float = 1e-10

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", lambda key, shape:
                            jnp.full(shape, self.scale_init), (x.shape[-1],))
        norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True)) + self.eps
        return weight * x / norm


def max_in_out_conf(tmp_conf: jnp.ndarray, first_source: bool) -> jnp.ndarray:
    """PyramidBox max-in-out confidence (pyramid.py:291-305).

    tmp_conf: [B,H,W,4].  Source 0: max over first 3 channels is background,
    4th is face.  Sources 1+: 1st channel is background, max over last 3 is face.
    Returns [B,H,W,2].
    """
    if first_source:
        neg = jnp.max(tmp_conf[..., :3], axis=-1, keepdims=True)
        pos = tmp_conf[..., 3:4]
    else:
        neg = tmp_conf[..., 0:1]
        pos = jnp.max(tmp_conf[..., 1:4], axis=-1, keepdims=True)
    return jnp.concatenate([neg, pos], axis=-1)
