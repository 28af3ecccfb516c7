"""Tests for prior generation against the reference's Python-loop construction."""
import sys

import numpy as np
import pytest

from fdt.anchors import (prior_grid, pyramid_face_priors, pyramid_head_priors,
                         feature_map_sizes, facebox_default_boxes)
from fdt.config import PYRAMID_REPO, PYRAMID_TRY3, PriorConfig


def np_prior_loop(width, height, stride, box, scales, ars, idx, fw, fh):
    """Independent oracle of PriorBoxLayer.__call__ (prior_box.py:28-44)."""
    mean = []
    for i in range(fh):
        for j in range(fw):
            for s in range(scales[idx]):
                bs = (2 ** (1 / 3)) ** s
                cx = (j + 0.5) * stride[idx] / width
                cy = (i + 0.5) * stride[idx] / height
                sx = box[idx] * bs / width
                sy = box[idx] * bs / height
                mean.append([cx, cy, sx, sy])
                for ar in ars[idx]:
                    mean.append([cx, cy, sx / np.sqrt(ar), sy * np.sqrt(ar)])
    return np.array(mean, dtype=np.float32)


def test_prior_grid_matches_loop_oracle():
    cfg = PriorConfig(strides=(4, 8), boxes=(16, 32), scales=(2, 1),
                      aspect_ratios=((2.0,), ()))
    got = prior_grid(cfg, 0, 5, 3, 640, 480)
    want = np_prior_loop(640, 480, cfg.strides, cfg.boxes, cfg.scales,
                         cfg.aspect_ratios, 0, 5, 3)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
    got1 = prior_grid(cfg, 1, 4, 4, 640, 480)
    want1 = np_prior_loop(640, 480, cfg.strides, cfg.boxes, cfg.scales,
                          cfg.aspect_ratios, 1, 4, 4)
    np.testing.assert_allclose(got1, want1, rtol=1e-6, atol=1e-7)


def test_prior_grid_matches_reference_torch(reference_root):
    torch = pytest.importorskip("torch")
    from tests.conftest import import_reference
    pb = import_reference("layers.functions.prior_box")
    ref = pb.PriorBoxLayer(640, 640)
    cfg = PYRAMID_REPO.face_priors
    for idx, (fw, fh) in enumerate([(160, 160), (80, 80), (40, 40)]):
        want = ref(idx, fw, fh).numpy()
        got = prior_grid(cfg, idx, fw, fh, 640, 640)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pyramid_prior_counts_640():
    # 160²+80²+40²+20²+10²+5² = 34125 face priors (layers/box_utils.py:119 comment)
    shapes = feature_map_sizes(640, 640, PYRAMID_REPO.face_priors.strides)
    assert shapes == [(160, 160), (80, 80), (40, 40), (20, 20), (10, 10), (5, 5)]
    face = pyramid_face_priors(PYRAMID_REPO, shapes, 640, 640)
    assert face.shape == (34125, 4)
    head = pyramid_head_priors(PYRAMID_REPO, shapes, 640, 640)
    assert head.shape == (34125 - 160 * 160, 4)  # 8525


def test_pyramid_prior_counts_try3():
    shapes = feature_map_sizes(640, 640, PYRAMID_TRY3.face_priors.strides)
    face = pyramid_face_priors(PYRAMID_TRY3, shapes, 640, 640)
    assert face.shape == (160**2 + 80**2 + 40**2 + 20**2 + 10**2, 4)  # 34100


def test_feature_map_sizes_odd_resolution():
    # ceil-division chain, e.g. 1024x683 eval images
    shapes = feature_map_sizes(1024, 683, (4, 8))
    assert shapes[0] == (256, 171)
    assert shapes[1] == (128, 86)


def test_facebox_default_boxes_matches_reference(reference_root):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, str(reference_root))
    try:
        from FACEBOX.encoderl import DataEncoder
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    finally:
        sys.path.pop(0)
    want = DataEncoder().default_boxes_np
    got = facebox_default_boxes()
    assert got.shape == (21824, 4)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_facebox_default_boxes_count_breakdown():
    got = facebox_default_boxes()
    assert got.shape[0] == 32 * 32 * 21 + 16 * 16 + 8 * 8
