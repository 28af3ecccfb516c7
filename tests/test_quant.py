"""int8 post-training quantization (fdt/ops/quant.py).

Correctness is pinned two ways: the Int8Conv math against an exact integer
numpy oracle (XLA:CPU computes int8×int8→int32 convs exactly, verified here),
and end-to-end detection drift vs the float path on trained try3 weights —
the same protocol as the bf16 drift pins (tests/test_bf16_drift.py,
tests/test_trained_weights.py).
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from fdt.models.common import conv
from fdt.ops.quant import (MIN_QUANT_REDUCTION, Int8Conv, quant_mode,
                           quantized, quantize_symmetric)

TRAINED = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "net_weight", "try3_mini.npz")


def _oracle_int8_conv(x, kernel, bias, stride, pad, dilation, groups):
    """Exact integer reference for Int8Conv's quantized path (float64 host
    math for the scales, int64 accumulation for the contraction)."""
    xf = np.asarray(x, np.float32)
    amax = np.abs(xf).max()
    sx = amax / 127.0 if amax > 0 else 1.0
    xq = np.clip(np.round(xf / np.float32(sx)), -127, 127).astype(np.int64)
    kf = np.asarray(kernel, np.float32)
    sw = np.abs(kf).max(axis=(0, 1, 2))
    sw = np.where(sw > 0, sw / 127.0, 1.0).astype(np.float32)
    kq = np.clip(np.round(kf / sw), -127, 127).astype(np.int64)

    b, h, w, cin = xq.shape
    kh, kw, _, cout = kq.shape
    xp = np.pad(xq, ((0, 0), pad, pad, (0, 0)))
    oh = (h + 2 * pad[0] - dilation * (kh - 1) - 1) // stride + 1
    ow = (w + 2 * pad[0] - dilation * (kw - 1) - 1) // stride + 1
    y = np.zeros((b, oh, ow, cout), np.int64)
    cpg = cin // groups           # channels per group
    opg = cout // groups
    for i in range(oh):
        for j in range(ow):
            for g in range(groups):
                patch = xp[:,
                           i * stride: i * stride + dilation * (kh - 1) + 1: dilation,
                           j * stride: j * stride + dilation * (kw - 1) + 1: dilation,
                           g * cpg:(g + 1) * cpg]
                y[:, i, j, g * opg:(g + 1) * opg] = np.einsum(
                    "bhwc,hwco->bo", patch, kq[..., g * opg:(g + 1) * opg])
    out = y.astype(np.float32) * (np.float32(sx) * sw)
    if bias is not None:
        out = out + np.asarray(bias, np.float32)
    return out


@pytest.mark.parametrize("groups,stride,pad,dil", [
    (1, 1, 1, 1),      # plain 3×3
    (1, 2, 1, 1),      # strided
    (1, 1, 2, 2),      # dilated (SSH branches)
    (2, 1, 1, 1),      # grouped (mobile latlayers)
])
def test_int8conv_matches_integer_oracle(groups, stride, pad, dil):
    rng = np.random.RandomState(groups * 7 + stride * 3 + dil)
    cin, cout, k = 64, 32, 3
    x = rng.randn(2, 10, 10, cin).astype(np.float32) * 3.0
    m = Int8Conv(cout, (k, k), strides=(stride, stride),
                 padding=((pad, pad), (pad, pad)), feature_group_count=groups,
                 kernel_dilation=(dil, dil))
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(m.apply(variables, jnp.asarray(x)))
    kernel = np.asarray(variables["params"]["kernel"])
    bias = np.asarray(variables["params"]["bias"])
    want = _oracle_int8_conv(x, kernel, bias, stride, (pad, pad), dil, groups)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_quantize_symmetric_zero_tensor():
    q, s = quantize_symmetric(jnp.zeros((4, 4)), axes=None)
    assert np.all(np.asarray(q) == 0) and float(s.reshape(())) == 1.0


def test_context_scoping_and_nesting():
    assert quant_mode() is None
    with quantized("int8"):
        assert quant_mode() == "int8"
        with quantized(None):
            assert quant_mode() is None
        assert quant_mode() == "int8"
    assert quant_mode() is None
    with pytest.raises(ValueError):
        with quantized("int4"):
            pass


def test_conv_helper_swaps_module_inside_context():
    c_plain = conv(8, 3, padding=1)
    assert isinstance(c_plain, nn.Conv)
    with quantized("int8"):
        c_q = conv(8, 3, padding=1)
    assert isinstance(c_q, Int8Conv)


def test_param_structure_matches_nn_conv():
    """A variables tree from the float model applies under quant (and init
    under quant yields the identical tree: same names, shapes AND values —
    the RNG folding depends only on module path and param names)."""
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 64), jnp.float32)

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = conv(32, 3, padding=1, name="c1")(x)
            return conv(16, 1, groups=2, name="c2")(x)

    v_float = Net().init(jax.random.PRNGKey(7), x)
    with quantized("int8"):
        v_quant = Net().init(jax.random.PRNGKey(7), x)
        y = Net().apply(v_float, x)          # float-init tree applies
    assert y.shape == (1, 8, 8, 16)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), v_float, v_quant)


def test_small_conv_falls_back_to_float():
    """reduction < MIN_QUANT_REDUCTION (e.g. a 3-channel stem or depthwise
    3×3) keeps the float path — bit-equal to nn.Conv on CPU."""
    cin = 3
    assert 3 * 3 * cin < MIN_QUANT_REDUCTION
    x = jnp.asarray(np.random.RandomState(1).randn(1, 8, 8, cin), jnp.float32)
    m_f = conv(8, 3, padding=1)
    v = m_f.init(jax.random.PRNGKey(3), x)
    with quantized("int8"):
        m_q = conv(8, 3, padding=1)
    np.testing.assert_array_equal(np.asarray(m_f.apply(v, x)),
                                  np.asarray(m_q.apply(v, x)))


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(TRAINED),
                    reason="trained weights artifact absent")
def test_detector_quant_drift_trained():
    """End-to-end int8 drift at eval thresholds on trained try3 weights —
    quant analog of test_bf16_drift_trained."""
    import cv2
    from fdt.geometry.boxes import iou_matrix
    from fdt.infer.pyramidbox import PyramidBoxDetector, detections_to_rows
    from fdt.models.loader import load_pyramidbox_detector

    det = load_pyramidbox_detector("try3", TRAINED, budget=2048)
    det_q = PyramidBoxDetector(det.variables, det.model, "try3",
                               budget=2048, quant="int8")
    img = cv2.imread("/root/reference/image_and_anno/test_image/try1/"
                     "try1_thresh_0.39_13.jpg")
    img = cv2.resize(img, (640, 640))

    def rows(d):
        t = d.detect_tensor(img[None], conf_thresh=0.05, nms_thresh=0.35)[0]
        return detections_to_rows(t, 0.35, [640, 640, 640, 640])

    r_f = rows(det)
    r_q = rows(det_q)
    assert abs(len(r_f) - len(r_q)) <= 2
    iou = np.asarray(iou_matrix(jnp.asarray(r_f[:, :4]),
                                jnp.asarray(r_q[:, :4])))
    m = iou.max(1) > 0.5
    assert m.mean() >= 0.9
    assert np.median(iou.max(1)[m]) >= 0.95
    d = np.abs(r_f[m, 4] - r_q[iou.argmax(1)[m], 4]).max()
    assert d <= 0.08, d
