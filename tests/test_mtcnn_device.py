"""Device-side MTCNN cascade vs the host-path parity oracle on real weights.

The host path (fdt.infer.mtcnn) is itself parity-tested against the torch
reference (tests/test_mtcnn.py), so it serves as the oracle here.  The device
path differs only by staying in float where the reference quantizes to uint8
after each cv2.resize; drift bounds below were measured on the shipped sample
images and asserted with margin.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from fdt.infer.mtcnn import load_mtcnn_detector
from fdt.infer.mtcnn_device import MTCNNDeviceCascade, build_plan

P = "/root/reference/MTCNN/original_model/pnet_epoch.pt"
R = "/root/reference/MTCNN/original_model/rnet_epoch.pt"
O = "/root/reference/MTCNN/original_model/onet_epoch.pt"


@pytest.fixture(scope="module")
def host_detector():
    import pathlib
    if not pathlib.Path(P).exists():
        pytest.skip("MTCNN weights not available")
    return load_mtcnn_detector(P, R, O)


@pytest.fixture(scope="module")
def device_detector(host_detector):
    return MTCNNDeviceCascade(host_detector.vars["pnet"],
                              host_detector.vars["rnet"],
                              host_detector.vars["onet"])


@pytest.fixture(scope="module")
def test_image(reference_root):
    import cv2
    img_path = sorted((reference_root / "image_and_anno/test_image/try1").glob("*.jpg"))[0]
    return cv2.resize(cv2.imread(str(img_path)), (320, 240))


def test_plan_matches_reference_ladder():
    """Scale ladder sizes replicate cv2.resize(None, fx=s) + the >12 stop rule."""
    import cv2
    img = np.zeros((240, 320, 3), np.uint8)
    plan = build_plan(240, 320)
    s = 12.0 / 12.0
    want = []
    im = cv2.resize(img, None, fx=s, fy=s)
    while min(im.shape[:2]) > 12:
        want.append(im.shape[:2])
        s *= 0.709
        im = cv2.resize(img, None, fx=s, fy=s)
    got = [(lh, lw) for lh, lw, _, _ in plan.levels]
    assert got == want
    # even offsets (PNet stride-2 pooling alignment) and no overlap
    offs = [y for _, _, y, _ in plan.levels]
    assert all(o % 2 == 0 for o in offs)
    for (lh, _, y, _), y_next in zip(plan.levels, offs[1:] + [plan.atlas_h]):
        assert y + lh <= y_next


def test_cell_boxes_match_generate_bounding_box():
    """Atlas cell→box constants equal the reference cell mapping per level."""
    from fdt.infer.mtcnn import generate_bounding_box
    plan = build_plan(120, 160)
    boxes = plan.cell_boxes.reshape(plan.map_h, plan.map_w, 4)
    level = plan.cell_level.reshape(plan.map_h, plan.map_w)
    for li, (lh, lw, y_off, sc) in enumerate(plan.levels):
        vh = (lh - 12) // 2 + 1
        vw = (lw - 12) // 2 + 1
        # all-above-threshold score map → every cell appears, row-major
        fake = np.ones((vh, vw), np.float32)
        ref = generate_bounding_box(fake, np.zeros((vh, vw, 4), np.float32),
                                    sc, 0.5)
        ours = boxes[y_off // 2: y_off // 2 + vh, :vw].reshape(-1, 4)
        np.testing.assert_array_equal(ours, ref[:, :4])
        assert (level[y_off // 2: y_off // 2 + vh, :vw] == li).all()


def test_device_cascade_matches_host(host_detector, device_detector, test_image):
    ref_boxes, ref_lm = host_detector.detect_face(test_image)
    boxes, lm = device_detector.detect_face(test_image)
    assert boxes.shape == ref_boxes.shape, (boxes.shape, ref_boxes.shape)
    if boxes.size == 0:
        return
    # device path differs from cv2 only by its fixed-point/uint8 rounding;
    # geometry agrees to the pixel, scores to ~1e-2
    np.testing.assert_allclose(boxes[:, :4], ref_boxes[:, :4], atol=2.0)
    np.testing.assert_allclose(boxes[:, 4], ref_boxes[:, 4], atol=2e-2)
    np.testing.assert_allclose(lm, ref_lm, atol=2.0)


@pytest.mark.slow
def test_device_cascade_native_size_sweep(host_detector, device_detector,
                                          reference_root):
    """Native-resolution parity on multi-face sample images.

    Measured across all 15 shipped samples (2026-08): counts identical on
    every image, matched IoU ≥ 0.74, score delta ≤ 0.054.  Asserted with
    margin on three images covering 1–12 faces."""
    import cv2
    from fdt.geometry.boxes import iou_matrix
    import jax.numpy as jnp

    for stem in ("13", "2", "4"):
        img = cv2.imread(str(reference_root / "image_and_anno/test_image/try1"
                              / f"try1_thresh_0.39_{stem}.jpg"))
        hb, _ = host_detector.detect_face(img)
        db, _ = device_detector.detect_face(img)
        assert len(db) == len(hb), (stem, len(db), len(hb))
        iou = np.asarray(iou_matrix(jnp.asarray(hb[:, :4]), jnp.asarray(db[:, :4])))
        j = iou.argmax(1)
        assert iou.max(1).min() > 0.7, stem
        assert np.abs(hb[:, 4] - db[j, 4]).max() < 0.08, stem


def test_budget_saturation_flag(host_detector, device_detector, test_image):
    """Silent truncation is impossible: a cascade with tiny budgets on a real
    multi-face image MUST raise `last_saturated`, and the default budgets on
    the sample images must NOT (the reference feeds unbounded candidate lists
    between stages, detect.py:352 — truncation is our deviation to flag)."""
    from fdt.infer.mtcnn_device import DeviceBudgets

    # default budgets: sample image does not saturate
    boxes, _ = device_detector.detect_face(test_image)
    assert boxes.size and device_detector.last_saturated is False

    tiny = MTCNNDeviceCascade(
        host_detector.vars["pnet"], host_detector.vars["rnet"],
        host_detector.vars["onet"],
        budgets=DeviceBudgets(pnet_cand_k=64, merge_k=16, rnet_k=16,
                              onet_k=8, out_k=4),
        crop_impl=device_detector.crop_impl,
        pnet_impl=device_detector.pnet_impl)
    tiny.detect_face(test_image)
    assert tiny.last_saturated is True

    # eval runner surfaces it: warns without a fallback, and re-detects
    # through the host oracle with one
    import cv2
    import warnings
    from fdt.eval.runner import eval_mtcnn
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        p = f"{td}/im.jpg"
        cv2.imwrite(p, test_image)
        anno = f"{td}/anno"
        with open(anno, "w") as f:
            f.write(f"{p} 1 10 10 50 50\n")
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            eval_mtcnn(tiny, anno, skip_ids=(), progress=False)
        assert any("saturated" in str(r.message) for r in rec)
        dump_fb = eval_mtcnn(tiny, anno, skip_ids=(), progress=False,
                             saturate_fallback=host_detector)
        dump_host = eval_mtcnn(host_detector, anno, skip_ids=(),
                               progress=False)
        np.testing.assert_allclose(dump_fb, dump_host)


def test_tier_ladder_escalates_and_sticks(host_detector, device_detector,
                                          test_image):
    """A budget ladder must escalate past saturated tiers to the first
    unsaturated one, return results equal to the full-budget cascade, and
    remember the escalation per shape (sticky start) so a stream of similar
    frames never re-runs the overflowing sweep."""
    from fdt.infer.mtcnn_device import DeviceBudgets

    want, want_lm = device_detector.detect_face(test_image)
    tiny = DeviceBudgets(pnet_cand_k=64, merge_k=16, rnet_k=16, onet_k=8,
                         out_k=4)                      # saturates for sure
    ladder = MTCNNDeviceCascade(
        host_detector.vars["pnet"], host_detector.vars["rnet"],
        host_detector.vars["onet"], fast_budgets=(tiny, tiny),
        crop_impl=device_detector.crop_impl,
        pnet_impl=device_detector.pnet_impl)
    assert ladder.tier_names == ("fast", "fast1")
    boxes, lm = ladder.detect_face(test_image)
    assert ladder.last_saturated is False              # full tier's verdict
    np.testing.assert_allclose(boxes, want, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(lm, want_lm, rtol=1e-5, atol=1e-4)
    h, w = test_image.shape[:2]
    assert ladder._start_tier[(h, w)] == 2             # both tiers skipped now
    calls = []
    orig = ladder._compiled
    ladder._compiled = lambda *a, **k: calls.append(k.get("tier")) or orig(*a, **k)
    boxes2, _ = ladder.detect_face(test_image)
    assert calls == ["full"]                           # sticky: straight to full
    np.testing.assert_allclose(boxes2, want, rtol=1e-5, atol=1e-4)


def test_device_cascade_empty_image(device_detector):
    """No faces → empty outputs, no crash (reference early-outs, detect.py:601)."""
    blank = np.zeros((240, 320, 3), np.uint8)
    boxes, lm = device_detector.detect_face(blank)
    assert boxes.size == 0 and lm.size == 0


def test_device_batch_consistent(device_detector, test_image):
    """vmapped batch path agrees with the single-image path."""
    single_boxes, _ = device_detector.detect_face(test_image)
    imgs = np.stack([test_image, np.zeros_like(test_image)])
    boxes, lm, counts, sat = device_detector.detect_batch(imgs)
    assert not sat.any()
    assert counts[1] == 0
    assert counts[0] == len(single_boxes)
    np.testing.assert_allclose(boxes[0, :counts[0]], single_boxes,
                               rtol=1e-5, atol=1e-4)


def test_pnet_s2d_matches_direct(device_detector):
    """Space-to-depth PNet (the TPU fast path) is numerically the direct
    conv stack: same taps, phase-packed into MXU-shaped matmuls."""
    from fdt.infer.mtcnn_device import _pnet_s2d
    from fdt.models.mtcnn import PNet

    pnet = PNet()
    rng = np.random.RandomState(0)
    for h, w in [(61, 83), (96, 64)]:
        x = rng.rand(h, w, 3).astype(np.float32)
        cls_d, reg_d = pnet.apply(device_detector.vars["pnet"],
                                  jnp.asarray(x)[None])
        cls_s, reg_s = _pnet_s2d(device_detector.vars["pnet"],
                                 jnp.asarray(x), "highest")
        np.testing.assert_allclose(np.asarray(cls_s),
                                   np.asarray(cls_d[0, :, :, 0]), atol=2e-6)
        np.testing.assert_allclose(np.asarray(reg_s), np.asarray(reg_d[0]),
                                   atol=2e-6)


def test_cascade_s2d_impl_matches_direct(device_detector, test_image):
    """Full cascade with pnet_impl='s2d' reproduces the direct-conv cascade."""
    from fdt.infer.mtcnn_device import MTCNNDeviceCascade

    s2d = MTCNNDeviceCascade(device_detector.vars["pnet"],
                             device_detector.vars["rnet"],
                             device_detector.vars["onet"],
                             device_detector.cfg, pnet_impl="s2d",
                             crop_impl=device_detector.crop_impl)
    b_ref, lm_ref = device_detector.detect_face(test_image)
    b_s2d, lm_s2d = s2d.detect_face(test_image)
    assert len(b_ref) == len(b_s2d)
    np.testing.assert_allclose(b_s2d, b_ref, atol=1e-3)
    np.testing.assert_allclose(lm_s2d, lm_ref, atol=1e-3)


def test_bucketed_matches_native(device_detector, reference_root):
    """Pad-to-bucket detect vs the native-resolution cascade: with the seam
    row/column replicate-padded, atlas levels zeroed past their native
    extents, and crop taps / box clamps honoring the native extent via
    traced scalars, detections are BIT-IDENTICAL on these pinned images.
    That is an empirical pin, not a general guarantee — the residual
    channels (seam-straddling PNet windows; half-integer rounding ties
    under the canvas-sized contraction, see the detect_face_bucketed
    docstring) can differ on unlucky images."""
    import cv2

    files = sorted((reference_root / "image_and_anno/test_image/try1")
                   .glob("*.jpg"))[:2]
    for f in files:
        img = cv2.resize(cv2.imread(str(f)), (300, 230))
        nb, nl = device_detector.detect_face(img)
        bb, bl = device_detector.detect_face_bucketed(img, multiple=128)
        assert len(nb) == len(bb)
        np.testing.assert_array_equal(np.asarray(nb), np.asarray(bb))
        np.testing.assert_array_equal(np.asarray(nl), np.asarray(bl))


def test_bucketed_truncates_ladder():
    """The bucketed canvas must NOT add coarse pyramid levels the native
    image never runs (a padded canvas otherwise extends the scale ladder and
    can detect faces larger than the native path structurally can)."""
    from fdt.infer.mtcnn_device import build_plan, n_pyramid_levels

    h, w = 150, 130
    n_native = n_pyramid_levels(h, w)
    canvas_plan_full = build_plan(256, 256)
    canvas_plan_trunc = build_plan(256, 256, max_levels=n_native)
    assert len(canvas_plan_full.levels) > n_native  # the hazard is real
    assert len(canvas_plan_trunc.levels) == n_native
    # truncated canvas ladder carries exactly the native scales
    native_plan = build_plan(h, w)
    assert ([s for (_, _, _, s) in canvas_plan_trunc.levels]
            == [s for (_, _, _, s) in native_plan.levels])


def test_bucketed_seam_replicate_levels_near_exact():
    """detect_face_bucketed replicate-pads one row/column past the native
    seam, making the resize taps of native-content pixels read image data
    (a downscale tap reaches at most ONE source pixel past the seam, and
    replicate collapses the straddling lerp to cv2's clamped border tap).
    The canvas-sized float32 contraction may still reassociate sums, so
    values within ~1 ulp of a rounding half-integer can quantize one gray
    level apart — rare (≈1e-7 of pixels over random images) and bounded by
    |Δ| = 1.  Zero padding (the pre-fix behavior) drifts by MANY gray levels
    at the seam — the hazard the replicate pad removes."""
    from fdt.infer.mtcnn_device import _resize_level, _scale_ladder

    rng = np.random.RandomState(3)
    h, w, ch, cw = 230, 300, 256, 384
    img = (rng.rand(h, w, 3) * 255).astype(np.float32).round()
    zero_pad = np.zeros((ch, cw, 3), np.float32)
    zero_pad[:h, :w] = img
    repl_pad = zero_pad.copy()
    repl_pad[h, :w] = img[h - 1]
    repl_pad[:h, w] = img[:, w - 1]
    repl_pad[h, w] = img[h - 1, w - 1]

    zero_max_drift = 0.0
    repl_diffs, n_px = 0, 0
    for (nlh, nlw, s) in _scale_ladder(h, w, 12.0, 0.709):
        clh, clw = int(np.rint(ch * s)), int(np.rint(cw * s))
        native = np.asarray(_resize_level(jnp.asarray(img), h, w, nlh, nlw, s))
        repl = np.asarray(_resize_level(jnp.asarray(repl_pad), ch, cw,
                                        clh, clw, s))[:nlh, :nlw]
        d = np.abs(repl - native)
        assert d.max() <= 1.0  # only half-integer rounding ties may flip
        repl_diffs += int((d > 0).sum())
        n_px += native.size
        zero = np.asarray(_resize_level(jnp.asarray(zero_pad), ch, cw,
                                        clh, clw, s))[:nlh, :nlw]
        zero_max_drift = max(zero_max_drift, float(np.abs(zero - native).max()))
    assert repl_diffs <= max(3, n_px // 100_000), (repl_diffs, n_px)
    assert zero_max_drift > 10.0  # zero padding: real content drift at the seam
