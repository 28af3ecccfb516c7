"""MTCNN cascade parity: our TPU cascade vs the torch reference on real weights."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fdt.infer.mtcnn import (MTCNNDetector, generate_bounding_box,
                             load_mtcnn_detector, pad_clamp, square_bbox)
from tests.conftest import import_reference

P = "/root/reference/MTCNN/original_model/pnet_epoch.pt"
R = "/root/reference/MTCNN/original_model/rnet_epoch.pt"
O = "/root/reference/MTCNN/original_model/onet_epoch.pt"


@pytest.fixture(scope="module")
def detector():
    import pathlib
    if not pathlib.Path(P).exists():
        pytest.skip("MTCNN weights not available")
    return load_mtcnn_detector(P, R, O)


@pytest.fixture(scope="module")
def ref_detector(reference_root):
    torch = pytest.importorskip("torch")
    detect = import_reference("MTCNN.mtcnn.core.detect")
    torch.cuda.memory_cached = lambda *a, **k: 0
    pnet, rnet, onet = detect.create_mtcnn_net(P, R, O, use_cuda=False)
    return detect.MtcnnDetector(pnet=pnet, rnet=rnet, onet=onet)


@pytest.fixture(scope="module")
def test_image(reference_root):
    import cv2
    img_path = sorted((reference_root / "image_and_anno/test_image/try1").glob("*.jpg"))[0]
    img = cv2.imread(str(img_path))
    return cv2.resize(img, (320, 240))


def test_square_and_pad_match_reference(rng):
    ref_detect = import_reference("MTCNN.mtcnn.core.detect")
    dets = np.column_stack([rng.rand(20, 2) * 200 - 20,
                            rng.rand(20, 2) * 200 + 150,
                            rng.rand(20, 1)])
    ref_sq = ref_detect.MtcnnDetector.square_bbox(dets)
    np.testing.assert_allclose(square_bbox(dets), ref_sq)
    a = np.round(ref_sq.copy())
    b = np.round(ref_sq.copy())
    want = ref_detect.MtcnnDetector.pad(a, 300, 250)
    got = pad_clamp(b, 300, 250)
    for wa, ga in zip(want, got):
        np.testing.assert_array_equal(ga, wa)
    np.testing.assert_allclose(b, a)  # same in-place clamping


def test_pnet_stage_matches_reference(detector, ref_detector, test_image):
    # NOTE: the reference's first return value is a stale loop variable
    # (detect.py:315 reassigns `boxes` per level); only boxes_align is meaningful.
    _, ref_align = ref_detector.detect_pnet(test_image)
    boxes, align = detector.detect_pnet(test_image)
    assert (align is None) == (ref_align is None)
    if align is None:
        return
    assert align.shape == ref_align.shape
    np.testing.assert_allclose(align[:, :4], ref_align[:, :4], atol=1.5)
    np.testing.assert_allclose(align[:, 4], ref_align[:, 4], atol=5e-3)


def test_full_cascade_matches_reference(detector, ref_detector, test_image):
    ref_boxes, ref_lm = ref_detector.detect_face(test_image)
    boxes, lm = detector.detect_face(test_image)
    assert boxes.shape == ref_boxes.shape
    if boxes.size:
        np.testing.assert_allclose(boxes[:, :4], ref_boxes[:, :4], atol=2.0)
        np.testing.assert_allclose(boxes[:, 4], ref_boxes[:, 4], atol=1e-2)
        np.testing.assert_allclose(lm, ref_lm, atol=2.0)
