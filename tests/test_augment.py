"""Invariant tests for the augmentation pipeline and train dataset transforms."""
import numpy as np
import pytest

from fdt.data.augment import (data_anchor_crop, photometric_distort,
                              pyramid_augment, random_mirror)
from fdt.data.widerface import annotation_transform


def synth_image(rng, h=300, w=400):
    return (rng.rand(h, w, 3) * 255).astype(np.float32)


def test_photometric_distort_range(rng):
    im = synth_image(rng)
    for seed in range(5):
        out = photometric_distort(im, np.random.RandomState(seed))
        assert out.shape == im.shape
        assert out.dtype == np.float32
        assert np.isfinite(out).all()


def test_data_anchor_crop_output(rng):
    im = synth_image(rng)
    boxes = np.array([[50, 60, 90, 110], [200, 100, 260, 180]], np.float32)
    labels = np.zeros(2)
    for seed in range(8):
        r = np.random.RandomState(seed)
        img, b, l = data_anchor_crop(im.copy(), boxes.copy(), labels.copy(), r)
        assert img.ndim == 3 and img.shape[2] == 3
        assert b.shape[0] == l.shape[0]
        # surviving box centers lie inside the crop
        if b.shape[0] and img.shape[0] == 640:
            centers = (b[:, :2] + b[:, 2:]) / 2
            assert (centers >= 0).all()
            assert (centers[:, 0] <= img.shape[1]).all()
            assert (centers[:, 1] <= img.shape[0]).all()


def test_random_mirror_flips_boxes():
    im = np.zeros((10, 20, 3), np.float32)
    boxes = np.array([[2.0, 1.0, 8.0, 5.0]])
    r = np.random.RandomState(1)  # first randint(2) == 1 → flip
    if not np.random.RandomState(1).randint(2):
        r = np.random.RandomState(0)
    img, b = random_mirror(im, boxes, r)
    np.testing.assert_allclose(b, [[20 - 8, 1, 20 - 2, 5]])


def test_pyramid_augment_end_to_end(rng):
    im = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
    boxes = np.array([[0.2, 0.2, 0.4, 0.45], [0.6, 0.5, 0.8, 0.9]], np.float32)
    labels = np.zeros(2, np.float32)
    for seed in range(4):
        img, b, l = pyramid_augment(im, boxes, labels, np.random.RandomState(seed))
        assert img.shape == (640, 640, 3)
        assert img.dtype == np.float32
        # mean-subtracted pixels live in [-255, 255]
        assert img.min() >= -255.1 and img.max() <= 255.1
        assert b.shape[0] == l.shape[0]


def test_annotation_transform_quirks():
    # zero-size dropped; negative w swaps x bounds (data/widerface.py:51-61)
    boxes = np.array([[10, 10, 0, 5], [10, 10, 5, 0],
                      [10, 10, -4, 5], [10, 10, 4, 5]], np.int32)
    res = annotation_transform(boxes, 100, 50)
    assert res.shape == (2, 5)
    np.testing.assert_allclose(res[0, :4], [0.06, 0.2, 0.1, 0.3], atol=1e-6)
    np.testing.assert_allclose(res[1, :4], [0.1, 0.2, 0.14, 0.3], atol=1e-6)
