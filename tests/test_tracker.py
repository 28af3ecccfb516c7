"""IoU tracker semantics tests — including the reference's faithful quirks."""
import numpy as np
import pytest

from fdt.config import TrackerConfig
from fdt.track import IoUTracker, track_detections, save_tracks, load_tracks


def det(x1, y1, x2, y2, s):
    return [x1, y1, x2, y2, s]


CFG = TrackerConfig(sigma_iou=0.4, sigma_h=0.6, t_min=2)


def test_basic_track_lifecycle(tmp_path):
    frames = [np.array([det(0, 0, 10, 10, 0.9)]),
              np.array([det(1, 0, 11, 10, 0.95)]),
              np.array([det(2, 0, 12, 10, 0.7)]),
              np.array([det(100, 100, 110, 110, 0.8)]),  # no overlap → new track
              ]
    tracks = track_detections(frames, CFG)
    # first track: 3 boxes, finished at flush (len 3 >= t_min 2, score .95 > .6)
    assert len(tracks) == 1
    t = tracks[0]
    assert t["start_frame"] == 1
    assert len(t["bboxes"]) == 3
    assert t["max_score"] == 0.95
    # round-trip through the reference .npy format
    p = tmp_path / "tracks.npy"
    save_tracks(tracks, str(p))
    loaded = load_tracks(str(p))
    assert loaded[0]["start_frame"] == 1


def test_unmatched_track_finishes_in_loop():
    # active track diverges while other detections exist → finished mid-stream
    frames = [np.array([det(0, 0, 10, 10, 0.9)]),
              np.array([det(0, 0, 10, 10, 0.9)]),
              np.array([det(0, 0, 10, 10, 0.9)]),
              np.array([det(500, 500, 510, 510, 0.1)]),  # far away det present
              ]
    tracks = track_detections(frames, CFG)
    assert len(tracks) == 1
    assert len(tracks[0]["bboxes"]) == 3


def test_empty_frame_silently_drops_tracks():
    # reference quirk (iouTracke_cal.py:130): zero-detection frame loses tracks
    frames = [np.array([det(0, 0, 10, 10, 0.9)]),
              np.array([det(0, 0, 10, 10, 0.9)]),
              np.array([det(0, 0, 10, 10, 0.9)]),
              np.empty((0, 5)),                        # drops the track silently
              np.array([det(0, 0, 10, 10, 0.9)]),      # new track starts
              ]
    tracks = track_detections(frames, CFG)
    assert len(tracks) == 0  # old track lost, new one too short... but:
    # new track has len 1 < t_min → not finished; old dropped silently.


def test_strict_inequality_thresholds():
    # in-loop finish requires len > t_min; flush requires len >= t_min
    cfg = TrackerConfig(sigma_iou=0.4, sigma_h=0.6, t_min=3)
    # exactly 3 boxes then flush → kept (>=)
    frames = [np.array([det(0, 0, 10, 10, 0.9)])] * 3
    assert len(track_detections(frames, cfg)) == 1
    # exactly 3 boxes then unmatched while dets exist → dropped (>)
    frames = [np.array([det(0, 0, 10, 10, 0.9)])] * 3 + \
             [np.array([det(500, 500, 510, 510, 0.1)])]
    tracks = track_detections(frames, cfg)
    assert all(t["start_frame"] != 1 or len(t["bboxes"]) != 3 for t in tracks)


def test_greedy_order_and_det_removal():
    # two tracks, two dets: first track takes the best det, second gets the rest
    frames = [np.array([det(0, 0, 10, 10, 0.9), det(20, 0, 30, 10, 0.8)]),
              np.array([det(1, 0, 11, 10, 0.5), det(21, 0, 31, 10, 0.5)]),
              np.array([det(2, 0, 12, 10, 0.5), det(22, 0, 32, 10, 0.5)])]
    tracks = track_detections(frames, CFG)
    assert len(tracks) == 2
    assert [len(t["bboxes"]) for t in tracks] == [3, 3]


def test_distance_mode():
    cfg = TrackerConfig(use_iou=False, sigma_dis=8.0, sigma_h=0.6, t_min=2)
    frames = [np.array([det(0, 0, 10, 10, 0.9)]),
              np.array([det(3, 0, 13, 10, 0.9)]),
              np.array([det(6, 0, 16, 10, 0.9)])]
    tracks = track_detections(frames, cfg)
    assert len(tracks) == 1
    assert len(tracks[0]["bboxes"]) == 3


def _random_stream(seed, frames=40, max_n=12):
    """Synthetic detection stream: drifting boxes + noise + dropouts."""
    rng = np.random.RandomState(seed)
    walkers = [(rng.rand(2) * 400, 20 + rng.rand() * 60, 0.3 + rng.rand() * 0.7)
               for _ in range(6)]
    stream = []
    for f in range(frames):
        rows = []
        for i, (c, s, q) in enumerate(walkers):
            if rng.rand() < 0.15:      # dropout
                continue
            c = c + rng.randn(2) * 4
            walkers[i] = (c, s, q)
            rows.append([c[0] - s / 2, c[1] - s / 2, c[0] + s / 2, c[1] + s / 2,
                         np.clip(q + rng.randn() * 0.1, 0, 1)])
        for _ in range(rng.poisson(1.0)):   # clutter
            c = rng.rand(2) * 400
            s = 10 + rng.rand() * 40
            rows.append([c[0], c[1], c[0] + s, c[1] + s, rng.rand() * 0.5])
        if rng.rand() < 0.07:
            rows = []                  # empty frame (silent-drop quirk)
        stream.append(np.asarray(rows, np.float32).reshape(-1, 5))
    return stream


@pytest.mark.parametrize("use_iou", [True, False])
@pytest.mark.parametrize("seed", [0, 7])
def test_device_tracker_matches_host(use_iou, seed):
    """The lax.scan device association replays to the exact host-tracker
    output: same tracks, same order, same boxes/scores/start frames."""
    from fdt.config import TrackerConfig
    from fdt.track.device_tracker import DeviceIoUTracker
    from fdt.track.iou_tracker import IoUTracker

    cfg = TrackerConfig(use_iou=use_iou, t_min=3)
    stream = _random_stream(seed)
    host = IoUTracker(cfg)
    for rows in stream:
        host.step(rows)
    want = host.flush()

    dev = DeviceIoUTracker(cfg, t_max=64)
    dev.step_chunk(stream[:17])        # uneven chunking on purpose
    dev.step_chunk(stream[17:])
    got = dev.flush()

    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g["start_frame"] == w["start_frame"]
        assert g["max_score"] == pytest.approx(w["max_score"], abs=1e-6)
        np.testing.assert_allclose(np.asarray(g["bboxes"]),
                                   np.asarray(w["bboxes"]), atol=1e-5)


def test_device_tracker_slot_overflow_autogrows():
    """More simultaneous tracks than t_max must auto-grow, not crash —
    the host tracker it mirrors is unbounded."""
    from fdt.track.device_tracker import DeviceIoUTracker
    from fdt.track.iou_tracker import IoUTracker

    cfg = TrackerConfig(t_min=1)
    rng = np.random.RandomState(0)
    # 24 well-separated persistent boxes >> t_max=8
    base = np.stack([np.arange(24) * 50.0, np.zeros(24),
                     np.arange(24) * 50.0 + 40, np.full(24, 40.0),
                     np.full(24, 0.9)], 1).astype(np.float32)
    stream = [base + rng.rand(*base.shape).astype(np.float32)
              for _ in range(6)]
    host = IoUTracker(cfg)
    for rows in stream:
        host.step(rows)
    want = host.flush()

    dev = DeviceIoUTracker(cfg, t_max=8)
    dev.step_chunk(stream)
    got = dev.flush()
    assert dev.t_max >= 24
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g["bboxes"]),
                                   np.asarray(w["bboxes"]), atol=1e-5)


def test_device_tracker_flush_resets_device_state():
    """Stepping after flush() must start fresh (IoUTracker contract) —
    device slots reset alongside the host mirrors."""
    from fdt.track.device_tracker import DeviceIoUTracker

    cfg = TrackerConfig(t_min=1)
    rows = np.array([[10, 10, 50, 50, 0.9]], np.float32)
    dev = DeviceIoUTracker(cfg, t_max=8)
    for _ in range(3):
        dev.step(rows)
    first = dev.flush()
    assert len(first) == 1 and len(first[0]["bboxes"]) == 3
    for _ in range(2):
        dev.step(rows)
    second = dev.flush()
    assert len(second) == 2          # finished list accumulates (reference)
    assert len(second[1]["bboxes"]) == 2
    assert second[1]["start_frame"] == 4


@pytest.mark.slow
def test_fused_video_tracker_matches_host():
    """FusedVideoTracker (fdt/track/fused.py) must reproduce the unfused
    track_video pipeline bit-for-bit AT MATCHING CHUNK SHAPES: the detection
    executable is batch-shape-specific (conv reductions round differently per
    batch size — measured 1-ulp conf drift between batch 3 and batch 6), so
    parity is defined against a host path detecting in the same chunks, just
    like two track_video runs with different batch_size differ by ulps."""
    import jax
    import jax.numpy as jnp
    from fdt.infer.pyramidbox import PyramidBoxDetector, detections_to_rows
    from fdt.models.pyramidbox_mobile import build_pyramidbox
    from fdt.track import FusedVideoTracker

    model = build_pyramidbox("try3")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)))
    detector = PyramidBoxDetector(variables, model, "try3", budget=1024)

    rng = np.random.RandomState(7)
    base = rng.randint(0, 255, (128, 128, 3), np.uint8)
    frames = np.stack([np.roll(base, 3 * f, axis=1) for f in range(6)])

    # pick a floor that keeps a moderate, realistic det count per frame so
    # the association sees extend/finish/spawn traffic without slot growth;
    # detect in the same 3-frame chunks the fused tracker will use
    det_t = np.concatenate([detector.detect_tensor(frames[:3]),
                            detector.detect_tensor(frames[3:])])
    floor = float(np.sort(det_t[0, 1, :, 0])[-16])
    assert floor > 0
    cfg = TrackerConfig(score_floor=floor, t_min=2)

    rows_list = [detections_to_rows(det_t[i], floor, [128, 128, 128, 128])
                 for i in range(6)]
    want = track_detections(rows_list, cfg)
    assert want, "fixture must finish at least one track"

    fused = FusedVideoTracker(detector, cfg)
    fused.step_frames(frames[:3])     # two chunks: slot state must carry over
    fused.step_frames(frames[3:])
    got = fused.flush()

    assert got == want                # bit-equal: IDs, histories, scores

    # slot-overflow path: t_max=2 forces the grow-and-redo branch of
    # step_frames (association re-runs from the already-read-back rows);
    # results must still be bit-equal to the unbounded host tracker
    fused_small = FusedVideoTracker(detector, cfg, t_max=2)
    fused_small.step_frames(frames[:3])
    fused_small.step_frames(frames[3:])
    assert fused_small.flush() == want
    assert fused_small.t_max > 2      # the grow path actually ran

    # empty-frame sentinel path: a floor above every score must reproduce the
    # host [[0,0,0,0,0.4]] sentinel rows (My_test.py:61-62) through the
    # fused conversion too
    hi = float(det_t[:, 1, :, 0].max()) + 0.1
    cfg2 = TrackerConfig(score_floor=hi, t_min=1, sigma_h=0.3)
    rows2 = [detections_to_rows(det_t[i], hi, [128, 128, 128, 128])
             for i in range(6)]
    want2 = track_detections(rows2, cfg2)
    fused2 = FusedVideoTracker(detector, cfg2)
    fused2.step_frames(frames)
    assert fused2.flush() == want2
