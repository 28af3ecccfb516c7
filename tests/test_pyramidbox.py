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
