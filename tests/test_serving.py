"""Micro-batching serving layer (fdt/apps/serving.py).

A capability beyond the reference (its only online path is the per-frame
webcam loop, Video.py:106-129).  Detection parity is carried by the underlying
detectors' golden tests; here we pin the SERVING semantics: results identical
to direct detector calls no matter how requests were coalesced, power-of-two
bucket padding, error relay, coordinate mapping back to each request's
resolution, and the HTTP front-end.
"""
import json
import threading
import time
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fdt.apps.serving import (DetectionService, MicroBatcher, _bucket,
                              make_http_server)


def test_bucket_sizes():
    assert [_bucket(n, 8) for n in [1, 2, 3, 4, 5, 7, 8, 9, 100]] == \
        [1, 2, 4, 4, 8, 8, 8, 8, 8]
    assert _bucket(3, 2) == 2


class TestMicroBatcher:
    def test_parity_and_order(self):
        with MicroBatcher(lambda xs: [x * 2 for x in xs],
                          max_batch=4, max_wait_ms=20) as mb:
            futs = [mb.submit(i) for i in range(10)]
            assert [f.result(timeout=30) for f in futs] == \
                [2 * i for i in range(10)]
            st = mb.stats()
            assert st["requests"] == 10
            assert st["mean_batch_size"] * st["batches"] == 10  # all served

    def test_coalesces_under_load(self):
        # a slow batch_fn backs the queue up; later batches must carry >1 item
        def fn(items):
            time.sleep(0.05)
            return items

        with MicroBatcher(fn, max_batch=8, max_wait_ms=200) as mb:
            futs = [mb.submit(i) for i in range(9)]
            assert [f.result(timeout=30) for f in futs] == list(range(9))
            assert mb.stats()["max_batch_size"] >= 2

    def test_error_relay_keeps_worker_alive(self):
        calls = []

        def fn(items):
            calls.append(len(items))
            if len(calls) == 1:
                raise ValueError("boom")
            return items

        with MicroBatcher(fn, max_batch=2, max_wait_ms=1) as mb:
            with pytest.raises(ValueError, match="boom"):
                mb.submit(1).result(timeout=30)
            assert mb.submit(2).result(timeout=30) == 2  # worker survived

    def test_length_mismatch_is_an_error(self):
        with MicroBatcher(lambda xs: xs[:-1] if len(xs) > 1 else xs,
                          max_batch=4, max_wait_ms=100) as mb:
            futs = [mb.submit(i) for i in range(3)]
            errs = []
            for f in futs:
                try:
                    f.result(timeout=30)
                except RuntimeError as e:
                    errs.append(e)
            # either all landed in one batch (all fail) or the trailing
            # stragglers made singleton batches (which succeed)
            assert errs, "a >1-item batch must fail on length mismatch"

    def test_submit_after_close(self):
        mb = MicroBatcher(lambda xs: xs, max_batch=2, max_wait_ms=1)
        mb.close()
        with pytest.raises(RuntimeError):
            mb.submit(1)
        mb.close()  # idempotent

    def test_cancelled_future_does_not_poison_batch(self):
        # block the worker so later submissions stay PENDING and cancellable
        gate = threading.Event()

        def fn(items):
            gate.wait(30)
            return items

        with MicroBatcher(fn, max_batch=4, max_wait_ms=1) as mb:
            blocker = mb.submit(0)
            time.sleep(0.05)  # worker is now inside fn for the first batch
            futs = [mb.submit(i) for i in (1, 2, 3)]
            assert futs[1].cancel()  # pending → cancel succeeds
            gate.set()
            # the cancelled sibling must not poison the live requests
            assert blocker.result(timeout=30) == 0
            assert futs[0].result(timeout=30) == 1
            assert futs[2].result(timeout=30) == 3
            assert futs[1].cancelled()


@pytest.fixture(scope="module")
def pyr_detector():
    from fdt.infer.pyramidbox import PyramidBoxDetector
    from fdt.models.pyramidbox_mobile import build_pyramidbox
    model = build_pyramidbox("try3")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    return PyramidBoxDetector(variables, model, "try3", budget=1024)


@pytest.fixture()
def pyr_service(pyr_detector):
    svc = DetectionService("pyramidbox", pyr_detector, frame_size=(128, 128),
                           threshold=0.1, max_batch=4, max_wait_ms=20)
    yield svc
    svc.close()


def _direct_rows(det, image, frame_wh, threshold):
    """The unbatched ground truth the service must reproduce."""
    import cv2
    from fdt.infer.pyramidbox import detections_to_rows
    h, w = image.shape[:2]
    frame = (image if (image.shape[1], image.shape[0]) == frame_wh
             else cv2.resize(image, frame_wh))
    d = det.detect_tensor(frame[None], conf_thresh=threshold,
                          nms_thresh=0.35)[0]
    rows = detections_to_rows(d, threshold, [w, h, w, h])
    if rows.shape == (1, 5) and not rows[0, :4].any():
        return np.empty((0, 5), np.float32)
    return rows.astype(np.float32)


def test_service_matches_direct_calls(pyr_service, pyr_detector, rng):
    # mixed request resolutions: the service must resize to its frame and map
    # boxes back to each request's own pixel coordinates
    images = [rng.randint(0, 255, (h, w, 3), np.uint8)
              for h, w in [(128, 128), (96, 160), (200, 64), (128, 128)]]
    futs = [pyr_service.submit(im) for im in images]
    got = [f.result(timeout=600) for f in futs]
    for im, rows in zip(images, got):
        want = _direct_rows(pyr_detector, im, (128, 128), 0.1)
        np.testing.assert_allclose(rows, want, rtol=1e-5, atol=1e-4)
    st = pyr_service.stats()
    assert st["requests"] == 4 and st["family"] == "pyramidbox"


def test_service_empty_result(pyr_detector):
    # softmax scores never reach 1.1 → guaranteed-empty detections
    with DetectionService("pyramidbox", pyr_detector, frame_size=(128, 128),
                          threshold=1.1, max_batch=2, max_wait_ms=1) as svc:
        rows = svc.detect(np.zeros((64, 64, 3), np.uint8))
    assert rows.shape == (0, 5)


def test_service_pads_to_bucket(pyr_service, pyr_detector, rng):
    # 3 concurrent requests pad to the 4-bucket; results must not include the
    # padding replica and must still match direct calls
    images = [rng.randint(0, 255, (128, 128, 3), np.uint8) for _ in range(3)]
    futs = [pyr_service.submit(im) for im in images]
    got = [f.result(timeout=600) for f in futs]
    assert len(got) == 3
    for im, rows in zip(images, got):
        np.testing.assert_allclose(
            rows, _direct_rows(pyr_detector, im, (128, 128), 0.1),
            rtol=1e-5, atol=1e-4)


def test_service_rejects_bad_input(pyr_service):
    with pytest.raises(ValueError):
        pyr_service.submit(np.zeros((64, 64), np.uint8))
    with pytest.raises(ValueError):
        DetectionService("resnet", pyr_service.detector)


def test_http_server(pyr_service, pyr_detector, rng):
    import cv2
    server = make_http_server(pyr_service, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        img = rng.randint(0, 255, (96, 128, 3), np.uint8)
        ok, enc = cv2.imencode(".png", img)  # lossless: decoded == img
        assert ok
        req = urllib.request.Request(f"http://127.0.0.1:{port}/detect",
                                     data=enc.tobytes(), method="POST")
        with urllib.request.urlopen(req, timeout=600) as r:
            payload = json.load(r)
        want = _direct_rows(pyr_detector, img, (128, 128), 0.1)
        got = np.asarray(payload["detections"], np.float32).reshape(-1, 5)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
        assert payload["count"] == len(want)

        # per-request threshold post-filter
        req2 = urllib.request.Request(
            f"http://127.0.0.1:{port}/detect?threshold=0.9",
            data=enc.tobytes(), method="POST")
        with urllib.request.urlopen(req2, timeout=600) as r:
            filt = json.load(r)
        want_f = want[want[:, 4] >= 0.9]
        assert filt["count"] == len(want_f)

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=60) as r:
            health = json.load(r)
        assert health["status"] == "ok" and health["family"] == "pyramidbox"

        # undecodable payload → 400; unknown path → 404
        bad = urllib.request.Request(f"http://127.0.0.1:{port}/detect",
                                     data=b"not an image", method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=60)
        assert ei.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/nope", timeout=60)
        assert ei.value.code == 404
    finally:
        server.shutdown()
        server.server_close()


def test_http_body_size_cap(pyr_service):
    server = make_http_server(pyr_service, port=0, max_body_bytes=64)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(f"http://127.0.0.1:{port}/detect",
                                     data=b"x" * 128, method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=60)
        assert ei.value.code == 413  # rejected before buffering
    finally:
        server.shutdown()
        server.server_close()


def test_facebox_service(reference_root, rng):
    import os
    from fdt.models.loader import load_facebox_detector
    pt = reference_root / "FACEBOX/faceboxes.pt"
    if not os.path.exists(pt):
        pytest.skip("faceboxes.pt not available")
    det = load_facebox_detector(str(pt))
    img = rng.randint(0, 255, (300, 400, 3), np.uint8)
    with DetectionService("facebox", det, threshold=0.35,
                          max_batch=2, max_wait_ms=1) as svc:
        assert (svc.frame_w, svc.frame_h) == (1024, 1024)  # fixed square input
        rows = svc.detect(img)
    # ground truth: the detector's own single-image path (same resize + scale)
    boxes, scores = det.detect(img)
    keep = scores >= 0.35
    want = (np.column_stack([boxes[keep], scores[keep]]).astype(np.float32)
            if keep.any() else np.empty((0, 5), np.float32))
    np.testing.assert_allclose(rows, want, rtol=1e-5, atol=1e-4)


def test_mtcnn_service(reference_root, rng):
    import os
    base = reference_root / "MTCNN/original_model"
    if not os.path.exists(base / "pnet_epoch.pt"):
        pytest.skip("mtcnn weights not available")
    from fdt.infer.mtcnn_device import load_device_cascade
    det = load_device_cascade(str(base / "pnet_epoch.pt"),
                              str(base / "rnet_epoch.pt"),
                              str(base / "onet_epoch.pt"))
    frame_w, frame_h = 64, 64  # tiny pyramid → cheap CPU compile
    img = rng.randint(0, 255, (128, 96, 3), np.uint8)
    with DetectionService("mtcnn", det, frame_size=(frame_w, frame_h),
                          threshold=0.0, max_batch=2, max_wait_ms=1) as svc:
        rows = svc.detect(img)
    assert rows.shape[1] == 15  # box+score then 10 landmark coords
    import cv2
    boxes, lms, counts, _ = det.detect_batch(
        cv2.resize(img, (frame_w, frame_h))[None])
    c = int(counts[0])
    if c:
        sx, sy = img.shape[1] / frame_w, img.shape[0] / frame_h
        want_box = boxes[0, :c].copy()
        want_box[:, [0, 2]] *= sx
        want_box[:, [1, 3]] *= sy
        np.testing.assert_allclose(rows[:, :5], want_box, rtol=1e-5, atol=1e-4)
        want_lm = lms[0, :c].copy()
        want_lm[:, 0::2] *= sx
        want_lm[:, 1::2] *= sy
        np.testing.assert_allclose(rows[:, 5:], want_lm, rtol=1e-5, atol=1e-4)
    else:
        assert rows.shape == (0, 15)
