"""PyramidBox architecture parity vs the torch reference (random weights,
converted through torch_convert) plus detector plumbing tests."""
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fdt.config import DetectConfig, PYRAMID_REPO
from fdt.models.pyramidbox import PyramidBox
from fdt.models.torch_convert import torch_to_flax
from fdt.infer.detect import ssd_detect
from fdt.infer.pyramidbox import PyramidBoxDetector, detections_to_rows


@pytest.fixture(scope="module")
def torch_sfd(reference_root):
    torch = pytest.importorskip("torch")
    from tests.conftest import import_reference
    try:
        pyramid = import_reference("pyramid")
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    torch.manual_seed(0)
    net = pyramid.build_sfd("train", 640, 2)
    net.eval()
    return net


@pytest.mark.slow
def test_pyramidbox_matches_torch_reference(torch_sfd, rng):
    import torch
    img = (rng.rand(1, 160, 160, 3) * 255).astype(np.float32)

    with torch.no_grad():
        loc_t, conf_t, priors_t, hloc_t, hconf_t, priors_head_t = torch_sfd(
            torch.from_numpy(img.transpose(0, 3, 1, 2)))

    model = PyramidBox()
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 160, 160, 3))))
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
    variables = torch_to_flax(
        {k: v.numpy() for k, v in torch_sfd.state_dict().items()
         if not k.endswith("num_batches_tracked")},
        template, strict=True)

    with jax.default_matmul_precision("highest"):
        out = model.apply(variables, jnp.asarray(img))

    np.testing.assert_allclose(np.asarray(out["face_loc"]), loc_t.numpy(),
                               rtol=1e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(out["face_conf"]), conf_t.numpy(),
                               rtol=1e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(out["head_loc"]), hloc_t.numpy(),
                               rtol=1e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(out["head_conf"]), hconf_t.numpy(),
                               rtol=1e-2, atol=2e-2)

    # priors: the reference caches them on firstTime from traced source shapes,
    # normalized by the CONFIGURED 640 size (not the actual input size)
    from fdt.anchors import pyramid_face_priors, pyramid_head_priors
    face_p = pyramid_face_priors(PYRAMID_REPO, out["source_shapes"], 640, 640)
    head_p = pyramid_head_priors(PYRAMID_REPO, out["source_shapes"], 640, 640)
    np.testing.assert_allclose(face_p, priors_t.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(head_p, priors_head_t.numpy(), rtol=1e-5, atol=1e-6)


def test_detections_to_rows_walk_semantics():
    det = np.zeros((2, 4, 5), np.float32)
    det[1, 0] = [0.9, 0.1, 0.1, 0.2, 0.2]
    det[1, 1] = [0.5, 0.3, 0.3, 0.4, 0.4]
    # threshold 0.4: prefix of class 1 is 2 rows; class 0 zeros excluded
    rows = detections_to_rows(det, 0.4, [100, 100, 100, 100])
    assert rows.shape == (2, 5)
    np.testing.assert_allclose(rows[0], [10, 10, 20, 20, 0.9], rtol=1e-5)
    # threshold 0: the all-zero class-0 rows and padding rows ARE walked
    rows0 = detections_to_rows(det, 0.0, [100, 100, 100, 100])
    assert rows0.shape == (8, 5)
    # nothing above threshold → reference sentinel
    sent = detections_to_rows(det, 0.95, [100, 100, 100, 100])
    np.testing.assert_allclose(sent, [[0, 0, 0, 0, 0.4]])


def test_ssd_detect_single_candidate_quirk():
    priors = jnp.asarray(np.array([[0.3, 0.3, 0.2, 0.2], [0.7, 0.7, 0.2, 0.2]],
                                  np.float32))
    loc = jnp.zeros((1, 2, 4))
    conf = jnp.asarray(np.array([[[0.4, 0.6], [0.9, 0.1]]], np.float32))
    cfg = DetectConfig(conf_thresh=0.5, top_k=4)
    out = ssd_detect(loc, conf, priors, cfg)          # one candidate → dropped
    assert float(jnp.abs(out).sum()) == 0.0
    cfg2 = DetectConfig(conf_thresh=0.5, top_k=4, drop_single_candidate=False)
    out2 = ssd_detect(loc, conf, priors, cfg2)
    assert float(out2[0, 1, 0, 0]) == pytest.approx(0.6, rel=1e-5)


def _direct_stem(variables, x, dtype=None):
    """Independent oracle of the ResNet50 stem: direct 7×7/2 conv + BN +
    ReLU + maxpool via raw lax ops (not the flax module under test)."""
    from fdt.models.common import max_pool
    p, bs = variables["params"], variables["batch_stats"]
    k = p["conv1"]["kernel"]
    g, b = p["bn1"]["scale"], p["bn1"]["bias"]
    mu, var = bs["bn1"]["mean"], bs["bn1"]["var"]
    if dtype is not None:
        x, k, g, b, mu, var = (t.astype(dtype) for t in (x, k, g, b, mu, var))
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(x, k, (2, 2), [(3, 3), (3, 3)],
                                     dimension_numbers=dn,
                                     precision=jax.lax.Precision.HIGHEST)
    y = g * (y - mu) * jax.lax.rsqrt(var + 1e-5) + b
    return max_pool(jnp.maximum(y, 0.0), 3, 2, 1)


@pytest.mark.parametrize("dtype,tol", [(None, 1e-4), (jnp.bfloat16, 0.05)])
def test_stem_s2d_matches_direct(rng, dtype, tol):
    """The space-to-depth stem packing is an exact rearrangement: same taps,
    same products (float-roundoff-level drift only — the s2d contraction
    sums the taps in a different order, so f32 agrees to ~1e-4 rel, not
    bit-exactly)."""
    from fdt.infer.pyramidbox import _stem_s2d
    model = PyramidBox(dtype=dtype)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    # odd-ish size exercises the pad_cells tail-slice path too
    x = jnp.asarray((rng.rand(2, 126, 130, 3) * 255).astype(np.float32) - 117)
    got = np.asarray(_stem_s2d(variables, x, "highest", dtype), np.float32)
    want = np.asarray(_direct_stem(variables, x, dtype), np.float32)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


def test_detector_stem_s2d_end_to_end(rng):
    """detect_tensor with stem_impl='s2d' equals the direct-stem detector."""
    model = PyramidBox()
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 128, 128, 3)))
    img = (rng.rand(1, 128, 128, 3) * 255).astype(np.uint8)
    kw = dict(budget=256, precision="highest")
    d_direct = PyramidBoxDetector(variables, model, "repo",
                                  stem_impl="direct", **kw)
    d_s2d = PyramidBoxDetector(variables, model, "repo",
                               stem_impl="s2d", **kw)
    a = d_direct.detect_tensor(img, conf_thresh=0.05, nms_thresh=0.35)
    b = d_s2d.detect_tensor(img, conf_thresh=0.05, nms_thresh=0.35)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_detector_stem_s2d_rejects_mobile_variants():
    from fdt.models.pyramidbox_mobile import build_pyramidbox
    model = build_pyramidbox("try3")
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))
    with pytest.raises(ValueError, match="flagship"):
        PyramidBoxDetector(variables, model, "try3", stem_impl="s2d")
