"""Opt-in post-training int8 quantized inference for the model zoo.

TPU MXUs execute int8×int8→int32 convolutions at twice the bf16 rate
(measured on this chip: 338 vs 151 T/s on a ResNet-scale 3×3 conv, 2.24×
wall-clock).  The reference framework has no quantized path (it runs f32
PyTorch CUDA end-to-end); this is a new TPU-native capability: dynamic
post-training quantization with

  * per-output-channel symmetric int8 weights (scale = amax/127, computed
    in-graph from the f32 params — works with any loaded checkpoint, no
    offline conversion step),
  * per-tensor symmetric dynamic activation scales (amax of the live
    activation; no calibration set needed, robust to distribution shift),
  * int32 accumulation on the MXU, dequant + bias on the VPU.

Activation of the mode is a trace-time context manager: every model in
fdt.models builds its convolutions through fdt.models.common.conv, which
swaps nn.Conv for Int8Conv (identical parameter structure, so existing
variables/checkpoints load unchanged) while `quantized("int8")` is active.
Detectors expose it as `quant="int8"`; accuracy drift against the f32 path
is measured and pinned in tests/test_quant.py the same way bf16 drift is
(tests/test_bf16_drift.py).

Tiny convolutions fall back to the regular float path: below
MIN_QUANT_REDUCTION multiply-accumulates per output element the MXU win is
noise while the relative quantization error is largest (depthwise 3×3 convs,
4-channel heads).
"""
from __future__ import annotations

import contextlib
import threading
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

# Quantize a conv only when its per-output reduction (kh*kw*cin/groups) is at
# least this large; smaller convs keep the float path (see module docstring).
MIN_QUANT_REDUCTION = 32

_STATE = threading.local()


def quant_mode() -> str | None:
    """The active quantization mode ("int8") or None.

    Read at *trace time* by fdt.models.common.conv — the `quantized` context
    must be open while the model's apply is being traced (detectors open it
    inside their jitted run functions, so it is part of the compiled graph).
    """
    return getattr(_STATE, "mode", None)


@contextlib.contextmanager
def quantized(mode: str | None = "int8"):
    """Trace-time switch: model convs built inside become Int8Conv."""
    if mode not in (None, "int8"):
        raise ValueError(f"unknown quantization mode: {mode!r}")
    prev = quant_mode()
    _STATE.mode = mode
    try:
        yield
    finally:
        _STATE.mode = prev


def quantize_symmetric(x: jnp.ndarray, axes) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 quantization: returns (q, scale) with x ≈ q * scale.

    `axes`: reduction axes for the amax (per-tensor: all axes; per-channel:
    all but the channel axis).  Zero tensors get scale 1 (q = 0).
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=axes, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


class Int8Conv(nn.Module):
    """Drop-in nn.Conv replacement running the MXU contraction in int8.

    Parameter structure (names, shapes, init) matches nn.Conv exactly, so a
    variables tree initialized or checkpoint-converted for the float model
    applies unchanged.  Only the conv geometry actually used by this repo's
    `conv()` helper is supported (explicit pair padding, symmetric stride /
    dilation, HWIO kernels, NHWC).
    """
    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    padding: Sequence[tuple[int, int]]
    use_bias: bool = True
    feature_group_count: int = 1
    kernel_dilation: Sequence[int] = (1, 1)
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kshape = (tuple(self.kernel_size)
                  + (in_features // self.feature_group_count, self.features))
        kernel = self.param("kernel", nn.initializers.lecun_normal(), kshape)
        bias = (self.param("bias", nn.initializers.zeros_init(), (self.features,))
                if self.use_bias else None)
        dn = jax.lax.conv_dimension_numbers(x.shape, kshape,
                                            ("NHWC", "HWIO", "NHWC"))
        out_dtype = self.dtype or jnp.float32
        reduction = kshape[0] * kshape[1] * kshape[2]
        if reduction < MIN_QUANT_REDUCTION:
            y = jax.lax.conv_general_dilated(
                x.astype(out_dtype), kernel.astype(out_dtype),
                tuple(self.strides), tuple(self.padding),
                rhs_dilation=tuple(self.kernel_dilation),
                dimension_numbers=dn,
                feature_group_count=self.feature_group_count,
                preferred_element_type=out_dtype)
        else:
            xq, sx = quantize_symmetric(x, axes=None)         # per-tensor
            wq, sw = quantize_symmetric(kernel, axes=(0, 1, 2))  # per-out-channel
            y32 = jax.lax.conv_general_dilated(
                xq, wq, tuple(self.strides), tuple(self.padding),
                rhs_dilation=tuple(self.kernel_dilation),
                dimension_numbers=dn,
                feature_group_count=self.feature_group_count,
                preferred_element_type=jnp.int32)
            # sx is a scalar (keepdims [1,1,1,1]); sw broadcasts over Cout.
            y = (y32.astype(jnp.float32)
                 * (sx.reshape(()) * sw.reshape(-1))).astype(out_dtype)
        if bias is not None:
            y = y + bias.astype(out_dtype)
        return y
