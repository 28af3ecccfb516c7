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


def test_expand_matches_reference(rng):
    """expand() == reference Expand under the same RNG draws (augmentations.py:376-399)."""
    from fdt.data.augment import expand

    image = (rng.rand(40, 60, 3) * 255).astype(np.float32)
    boxes = np.array([[5.0, 5.0, 20.0, 30.0], [10.0, 8.0, 50.0, 35.0]])
    # reference draws: randint(2) gate, uniform ratio, uniform left/top
    r1 = np.random.RandomState(3)
    got_img, got_boxes = expand(image, boxes, np.random.RandomState(3))
    if r1.randint(2):
        want_img, want_boxes = image, boxes
    else:
        h, w, d = image.shape
        ratio = r1.uniform(1, 4)
        left = r1.uniform(0, w * ratio - w)
        top = r1.uniform(0, h * ratio - h)
        want_img = np.zeros((int(h * ratio), int(w * ratio), d), image.dtype)
        want_img[:, :, :] = (104, 117, 123)
        want_img[int(top):int(top + h), int(left):int(left + w)] = image
        want_boxes = boxes.copy()
        want_boxes[:, :2] += (int(left), int(top))
        want_boxes[:, 2:] += (int(left), int(top))
    np.testing.assert_array_equal(got_img, want_img)
    np.testing.assert_array_equal(got_boxes, want_boxes)


def test_debug_visualizers(tmp_path, rng):
    """Headless overlays render and save (vision.py + encoderl.test_encode ports)."""
    from fdt.utils.visualize import draw_matched_anchors, vis_face, vis_two

    im = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    dets = np.array([[4, 4, 30, 30, 0.95], [10, 10, 40, 40, 0.5]], np.float32)
    vis_two(im, dets, dets, save_path=str(tmp_path / "two.png"))
    lm = rng.rand(1, 10).astype(np.float32) * 60
    vis_face(im, dets[:1], lm, save_path=str(tmp_path / "face.png"))
    assert (tmp_path / "two.png").exists() and (tmp_path / "face.png").exists()

    imgs = draw_matched_anchors(np.zeros((128, 128, 3), np.uint8),
                                np.array([[0.2, 0.2, 0.5, 0.5]]),
                                save_prefix=str(tmp_path / "enc"))
    assert len(imgs) == 3
    assert (tmp_path / "enc_0.jpg").exists()
    # the matched-anchor group must actually mark some anchors green
    assert any((im[:, :, 1] == 255).any() for im in imgs)


def test_data_anchor_crop_empty_gt_no_crash(rng):
    """Zero-GT input falls back to a plain resize instead of crashing
    (the reference's RandomBaiduCrop raises on randrange(0))."""
    from fdt.data.augment import data_anchor_crop

    img = (rng.rand(100, 120, 3) * 255).astype(np.float32)
    out, boxes, labels = data_anchor_crop(img, np.zeros((0, 4), np.float32),
                                          np.zeros((0,)), rng)
    assert out.shape == (640, 640, 3)
    assert boxes.shape == (0, 4)


def test_dataset_drops_zero_face_records(tmp_path):
    """gen_anno_file_train carries 4 degenerate '0 0 0 0' lines; the dataset
    must drop them (no face to anchor the crop on) but keep records where at
    least one real box exists."""
    import cv2

    from fdt.data.widerface import WiderFaceDataset

    img = (np.random.RandomState(0).rand(60, 60, 3) * 255).astype(np.uint8)
    p = tmp_path / "a.jpg"
    cv2.imwrite(str(p), img)
    anno = tmp_path / "anno.txt"
    anno.write_text(f"{p} 1 0 0 0 0\n"            # all-degenerate: dropped
                    f"{p} 2 0 0 0 0 5 5 20 20\n"  # one real box: kept
                    f"{p} 1 10 10 30 30\n")
    ds = WiderFaceDataset(str(anno))
    assert len(ds) == 2


def test_base_transform_matches_reference_formula(rng):
    """base_transform = resize(size,size) + mean subtract (reference
    data/__init__.py:6-21)."""
    import cv2

    from fdt.data.augment import base_transform

    img = (rng.rand(37, 53, 3) * 255).astype(np.uint8)
    got = base_transform(img, 16)
    want = cv2.resize(img, (16, 16)).astype(np.float32) - \
        np.array((104, 117, 123), np.float32)
    np.testing.assert_array_equal(got, want)
    assert got.dtype == np.float32
