"""Quantify the bucketed-batched eval's accuracy cost vs the native protocol
(fdt/eval/batched.py pad-seam drift) on the shipped sample images.

Two regression bounds:
  * an image already AT its bucket size goes through the batched path
    bit-identically to the native path (no pad → no seam);
  * a padded image's detections stay close to the native ones.  Measured
    2026-08 on try3 @ seed-0 UNTRAINED weights (the pessimistic case — the
    outputs are noise, so seam perturbations scatter maximally): row count
    delta 1/393, 85% of rows matched at IoU>0.5, max matched score delta
    0.076.  Asserted with margin; the trained-weights version
    (tests/test_trained_weights.py::test_pad_seam_drift_trained) measures the
    non-pessimistic case: counts equal, 100% matched, Δscore 0.0039.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fdt.geometry.boxes import iou_matrix
from fdt.infer.pyramidbox import PyramidBoxDetector, detections_to_rows


@pytest.fixture(scope="module")
def detector():
    from fdt.models.pyramidbox_mobile import build_pyramidbox
    model = build_pyramidbox("try3")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    return PyramidBoxDetector(variables, model, "try3", budget=1024)


@pytest.fixture(scope="module")
def sample(reference_root):
    import cv2
    p = sorted((reference_root / "image_and_anno/test_image/try1").glob("*.jpg"))[1]
    return cv2.imread(str(p))


def _batched_rows(detector, image, bw, bh, threshold):
    """One image through the batched-bucket path (fdt/eval/batched.py)."""
    from fdt.config import PIXEL_MEAN_BGR
    h, w, _ = image.shape
    canvas = np.zeros((1, bh, bw, 3), np.uint8)
    canvas[0, :, :] = np.array(PIXEL_MEAN_BGR, np.float32).astype(np.uint8)
    canvas[0, :h, :w] = image
    det = detector.detect_tensor(canvas, conf_thresh=threshold, nms_thresh=0.35)
    return detections_to_rows(det[0], threshold, [bw, bh, bw, bh])


@pytest.mark.slow
def test_bucket_aligned_image_is_exact(detector, sample):
    import cv2
    img = cv2.resize(sample, (384, 256))  # equals its 128-multiple bucket
    native = detector.detect_face(img, 0.3)
    batched = _batched_rows(detector, img, 384, 256, 0.3)
    np.testing.assert_array_equal(native, batched)


@pytest.mark.slow
def test_padded_image_drift_bounded(detector, sample):
    import cv2
    img = cv2.resize(sample, (360, 230))  # pads to 384×256
    native = detector.detect_face(img, 0.3)
    batched = _batched_rows(detector, img, 384, 256, 0.3)
    # sentinel-only outcomes must agree
    is_sent = lambda r: r.shape == (1, 5) and r[0, 4] == 0.4 and not r[0, :4].any()
    assert is_sent(native) == is_sent(batched)
    if is_sent(native):
        return
    assert abs(len(native) - len(batched)) <= 0.05 * len(native)
    iou = np.asarray(iou_matrix(jnp.asarray(native[:, :4]),
                                jnp.asarray(batched[:, :4])))
    j = iou.argmax(1)
    matched = iou.max(1) > 0.5
    assert matched.mean() > 0.75, f"only {matched.mean():.0%} rows matched"
    score_delta = np.abs(native[matched, 4] - batched[j[matched], 4]).max()
    assert score_delta < 0.12, score_delta
