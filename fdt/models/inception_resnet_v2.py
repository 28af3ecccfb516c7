"""Inception-ResNet-v2 (NHWC flax), checkpoint-loadable from the reference.

The reference ships this classifier at MTCNN/mtcnn/core/resnet_inception_v2.py
(BasicConv2d:8-20, Mixed_5b:23-51, Block35:54-84, Mixed_6a:87-106,
Block17:109-133, Mixed_7a:136-164, Block8:167-194, InceptionResnetV2:197-279).
No reference driver imports it (dead code there), but it is part of the
component surface, so it is provided here — rebuilt as two generic,
spec-table-driven modules instead of seven hand-unrolled classes:

  * ``InceptionMix``     — parallel branches, channel concat (Mixed_5b/6a/7a).
  * ``ResidualScale``    — branches → concat → linear 1×1 → x + scale·out
                           → optional ReLU (Block35/17/8).

Branch tables below carry the exact kernel/stride/padding/channel plan of the
reference, and submodule names mirror the torch module paths (Sequential
indices, '.' spelled '__') so fdt.models.torch_convert loads its checkpoints
mechanically.

Reference BN quirks kept: eps=1e-3, and torch ``momentum=0`` (running stats
frozen at init — the module was clearly meant for pretrained weights); our
inference path uses running averages, which matches.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from fdt.models.common import conv, pad2d

Dtype = Any

# A branch is a tuple of steps; each step is
#   ("conv", features, kernel, stride, padding)  — BasicConv2d
#   ("avgpool",)                                 — AvgPool2d(3, 1, 1, count_include_pad=False)
#   ("maxpool",)                                 — MaxPool2d(3, stride=2)
# Steps occupy torch Sequential indices in order (pools included), which the
# flax names must reproduce for checkpoint conversion.
BranchSpec = Tuple[tuple, ...]

# Mixed_5b (resnet_inception_v2.py:23-51)
MIXED_5B: Tuple[BranchSpec, ...] = (
    (("conv", 96, 1, 1, 0),),
    (("conv", 48, 1, 1, 0), ("conv", 64, 5, 1, 2)),
    (("conv", 64, 1, 1, 0), ("conv", 96, 3, 1, 1), ("conv", 96, 3, 1, 1)),
    (("avgpool",), ("conv", 64, 1, 1, 0)),
)
# Mixed_6a (resnet_inception_v2.py:87-106)
MIXED_6A: Tuple[BranchSpec, ...] = (
    (("conv", 384, 3, 2, 0),),
    (("conv", 256, 1, 1, 0), ("conv", 256, 3, 1, 1), ("conv", 384, 3, 2, 0)),
    (("maxpool",),),
)
# Mixed_7a (resnet_inception_v2.py:136-164)
MIXED_7A: Tuple[BranchSpec, ...] = (
    (("conv", 256, 1, 1, 0), ("conv", 384, 3, 2, 0)),
    (("conv", 256, 1, 1, 0), ("conv", 288, 3, 2, 0)),
    (("conv", 256, 1, 1, 0), ("conv", 288, 3, 1, 1), ("conv", 320, 3, 2, 0)),
    (("maxpool",),),
)
# Block35 / Block17 / Block8 branch plans (resnet_inception_v2.py:54-84,
# 109-133, 167-194).  (1,7)/(7,1) kernels carry tuple paddings.
BLOCK35: Tuple[BranchSpec, ...] = (
    (("conv", 32, 1, 1, 0),),
    (("conv", 32, 1, 1, 0), ("conv", 32, 3, 1, 1)),
    (("conv", 32, 1, 1, 0), ("conv", 48, 3, 1, 1), ("conv", 64, 3, 1, 1)),
)
BLOCK17: Tuple[BranchSpec, ...] = (
    (("conv", 192, 1, 1, 0),),
    (("conv", 128, 1, 1, 0), ("conv", 160, (1, 7), 1, (0, 3)),
     ("conv", 192, (7, 1), 1, (3, 0))),
)
BLOCK8: Tuple[BranchSpec, ...] = (
    (("conv", 192, 1, 1, 0),),
    (("conv", 192, 1, 1, 0), ("conv", 224, (1, 3), 1, (0, 1)),
     ("conv", 256, (3, 1), 1, (1, 0))),
)


class BasicConv2d(nn.Module):
    """Conv(no bias) + BN(eps 1e-3) + ReLU (resnet_inception_v2.py:8-20)."""
    features: int
    kernel: Any
    stride: Any = 1
    padding: Any = 0
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv(self.features, self.kernel, self.stride, self.padding,
                 name="conv", use_bias=False, dtype=self.dtype)(x)
        # momentum=1.0 freezes the running stats under train=True, matching
        # the reference's torch momentum=0 quirk (stats never update,
        # resnet_inception_v2.py:13)
        x = nn.BatchNorm(use_running_average=not train, momentum=1.0,
                         epsilon=1e-3, name="bn", dtype=self.dtype)(x)
        return nn.relu(x)


def _avg_pool_3x3(x):
    """AvgPool2d(3, stride=1, padding=1, count_include_pad=False)."""
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=pad2d(1),
                       count_include_pad=False)


def _max_pool_3x3s2(x):
    """MaxPool2d(3, stride=2) — no padding, floor output size."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")


def _run_branches(branches, dtype, x, train):
    """Run the branch spec table inside the caller's compact context, so the
    BasicConv2d children attach directly to the calling module with the torch
    path names: a single bare BasicConv2d branch is 'branch{i}', a Sequential
    branch's steps are 'branch{i}__{j}' (pools occupy indices, no params)."""
    outs = []
    for i, branch in enumerate(branches):
        y = x
        for j, step in enumerate(branch):
            if step[0] == "avgpool":
                y = _avg_pool_3x3(y)
            elif step[0] == "maxpool":
                y = _max_pool_3x3s2(y)
            else:
                _, f, k, s, p = step
                name = (f"branch{i}" if len(branch) == 1
                        else f"branch{i}__{j}")
                y = BasicConv2d(f, k, s, p, dtype=dtype, name=name)(y, train)
        outs.append(y)
    return outs


class InceptionMix(nn.Module):
    """Parallel branches → channel concat (Mixed_5b/6a/7a)."""
    branches: Tuple[BranchSpec, ...]
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = _run_branches(self.branches, self.dtype, x, train)
        return jnp.concatenate(outs, axis=-1)


class ResidualScale(nn.Module):
    """branches → concat → linear 1×1 ('conv2d') → x + scale·out → opt. ReLU
    (Block35/17/8, resnet_inception_v2.py:76-84,126-133,186-194)."""
    branches: Tuple[BranchSpec, ...]
    out_features: int
    scale: float = 1.0
    relu: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = _run_branches(self.branches, self.dtype, x, train)
        out = jnp.concatenate(outs, axis=-1)
        out = conv(self.out_features, 1, name="conv2d", dtype=self.dtype)(out)
        out = out * self.scale + x
        return nn.relu(out) if self.relu else out


class InceptionResnetV2(nn.Module):
    """Full classifier (resnet_inception_v2.py:197-279).

    ``repeats`` parameterizes the three residual towers (reference:
    10× Block35, 20× Block17, 9× Block8) so tests can instantiate reduced
    towers; defaults match the reference exactly.
    """
    num_classes: int = 1001
    repeats: Sequence[int] = (10, 20, 9)
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = BasicConv2d(32, 3, 2, 0, dt, name="conv2d_1a")(x, train)
        x = BasicConv2d(32, 3, 1, 0, dt, name="conv2d_2a")(x, train)
        x = BasicConv2d(64, 3, 1, 1, dt, name="conv2d_2b")(x, train)
        x = _max_pool_3x3s2(x)  # maxpool_3a
        x = BasicConv2d(80, 1, 1, 0, dt, name="conv2d_3b")(x, train)
        x = BasicConv2d(192, 3, 1, 0, dt, name="conv2d_4a")(x, train)
        x = _max_pool_3x3s2(x)  # maxpool_5a
        x = InceptionMix(MIXED_5B, dt, name="mixed_5b")(x, train)
        for i in range(self.repeats[0]):
            x = ResidualScale(BLOCK35, 320, 0.17, dtype=dt,
                              name=f"repeat__{i}")(x, train)
        x = InceptionMix(MIXED_6A, dt, name="mixed_6a")(x, train)
        for i in range(self.repeats[1]):
            x = ResidualScale(BLOCK17, 1088, 0.10, dtype=dt,
                              name=f"repeat_1__{i}")(x, train)
        x = InceptionMix(MIXED_7A, dt, name="mixed_7a")(x, train)
        for i in range(self.repeats[2]):
            x = ResidualScale(BLOCK8, 2080, 0.20, dtype=dt,
                              name=f"repeat_2__{i}")(x, train)
        x = ResidualScale(BLOCK8, 2080, 1.0, relu=False, dtype=dt,
                          name="block8")(x, train)
        x = BasicConv2d(1536, 1, 1, 0, dt, name="conv2d_7b")(x, train)
        # AvgPool2d(8, count_include_pad=False) then flatten + Linear
        x = nn.avg_pool(x, (8, 8), strides=(8, 8), padding="VALID",
                        count_include_pad=False)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.num_classes, name="classif", dtype=dt)(x)
