"""Offline multi-face IoU tracker (Bochinski 2017 style, greedy association).

Bit-faithful re-implementation of the association loop at iouTracke_cal.py:126-177,
with detection batched on TPU and the (inherently sequential, greedy,
order-dependent) association on host.  Faithful quirks preserved so the output
.npy matches the reference exactly, track IDs included:

  * a frame with ZERO detections silently DROPS all active tracks (they are
    neither extended nor finished — iouTracke_cal.py:130's `if len(dets) > 0`
    guard skips both branches);
  * an unmatched track finishes only if max_score > σ_h AND len > t_min
    (strictly greater, line 147), while the final flush uses len >= t_min
    (line 175);
  * matching is greedy in track order against the track's LAST box, removing
    the matched detection from the pool (lines 132-145).

Track schema: {'bboxes': [[x1,y1,x2,y2], ...], 'max_score': float,
'start_frame': int} — saved via np.save(video + '.npy', np.array(tracks)).
"""
from __future__ import annotations

from typing import Iterable, List, Sequence

import numpy as np

from fdt.config import TRACKER, TrackerConfig


def _iou_to_last(dets: np.ndarray, last_box: np.ndarray) -> np.ndarray:
    """IoU of [N,4] dets vs one box (utils/calc_performance.py:54-74)."""
    lt = np.maximum(dets[:, :2], last_box[:2])
    rb = np.minimum(dets[:, 2:], last_box[2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[:, 0] * wh[:, 1]
    area_d = (dets[:, 2] - dets[:, 0]) * (dets[:, 3] - dets[:, 1])
    area_t = (last_box[2] - last_box[0]) * (last_box[3] - last_box[1])
    return inter / (area_d + area_t - inter)


def _distance_to_last(dets: np.ndarray, last_box: np.ndarray) -> np.ndarray:
    """Center+size pseudo-distance (calculate_distance, calc_performance.py:34-51)."""
    d_hi, d_lo = dets[:, 2:], dets[:, :2]
    t_hi, t_lo = last_box[2:], last_box[:2]
    d_xy = (t_hi + t_lo) / 2 - (d_hi + d_lo) / 2
    d_sz = (d_hi - d_lo) - (t_hi - t_lo)
    d_z = (d_sz[:, 0] + d_sz[:, 1]) / 2
    dis = d_z * d_z + d_xy[:, 0] ** 2 + d_xy[:, 1] ** 2
    return dis ** 0.25


class IoUTracker:
    def __init__(self, cfg: TrackerConfig = TRACKER):
        self.cfg = cfg
        self.active: List[dict] = []
        self.finished: List[dict] = []
        self.frame_num = 0

    def step(self, det_rows: np.ndarray) -> None:
        """Advance one frame.  det_rows: [N,5] rows [x1,y1,x2,y2,score]."""
        cfg = self.cfg
        self.frame_num += 1
        dets = [list(map(float, r)) for r in np.asarray(det_rows)]
        updated = []
        for track in self.active:
            if len(dets) > 0:
                arr = np.array(dets)[:, :4]
                last = np.array(track["bboxes"][-1])
                if cfg.use_iou:
                    scores = _iou_to_last(arr, last)
                    best = int(scores.argmax())
                    matched = scores[best] > cfg.sigma_iou
                else:
                    scores = _distance_to_last(arr, last)
                    best = int(scores.argmin())
                    matched = scores[best] < cfg.sigma_dis
                if matched:
                    track["bboxes"].append(dets[best][:4])
                    track["max_score"] = max(track["max_score"], dets[best][4])
                    updated.append(track)
                    del dets[best]
                else:
                    if track["max_score"] > cfg.sigma_h and len(track["bboxes"]) > cfg.t_min:
                        self.finished.append(track)
            # len(dets) == 0: track silently dropped (reference behavior)
        new_tracks = [{"bboxes": [det[:4]], "max_score": det[4],
                       "start_frame": self.frame_num} for det in dets]
        self.active = updated + new_tracks

    def flush(self) -> List[dict]:
        """Final flush (iouTracke_cal.py:174-175)."""
        self.finished += [t for t in self.active
                          if t["max_score"] > self.cfg.sigma_h
                          and len(t["bboxes"]) >= self.cfg.t_min]
        self.active = []
        return self.finished


def track_detections(per_frame_rows: Iterable[np.ndarray],
                     cfg: TrackerConfig = TRACKER) -> List[dict]:
    """Run the tracker over precomputed per-frame detection rows."""
    tracker = IoUTracker(cfg)
    for rows in per_frame_rows:
        tracker.step(rows)
    return tracker.flush()


def track_video(video_path: str, detector, cfg: TrackerConfig = TRACKER,
                batch_size: int = 8, frame_size=(640, 480),
                detect_threshold: float | None = None,
                device_tracker: bool = False) -> List[dict]:
    """Offline tracking over a video file (iouTracke_cal.py driver).

    Frames are decoded/resized on host and detected in TPU batches of
    `batch_size`.  `detector` is a fdt.infer.pyramidbox.PyramidBoxDetector.
    device_tracker=True runs the greedy association as a jitted lax.scan on
    device too (fdt.track.device_tracker; bit-parity tested vs the host loop).
    """
    import cv2
    from fdt.infer.pyramidbox import detections_to_rows

    thr = cfg.score_floor if detect_threshold is None else detect_threshold
    cap = cv2.VideoCapture(video_path)
    if device_tracker:
        from fdt.track.device_tracker import DeviceIoUTracker
        tracker = DeviceIoUTracker(cfg)
    else:
        tracker = IoUTracker(cfg)
    w, h = frame_size
    scale = [w, h, w, h]
    batch: List[np.ndarray] = []

    def run_batch():
        if not batch:
            return
        det = detector.detect_tensor(np.stack(batch))
        rows_list = [detections_to_rows(det[i], thr, scale)
                     for i in range(det.shape[0])]
        if hasattr(tracker, "step_chunk"):
            tracker.step_chunk(rows_list)      # one device call per batch
        else:
            for rows in rows_list:
                tracker.step(rows)
        batch.clear()

    while True:
        ret, frame = cap.read()
        if not ret:
            break
        batch.append(cv2.resize(frame, frame_size))
        if len(batch) == batch_size:
            run_batch()
    run_batch()
    cap.release()
    return tracker.flush()


def save_tracks(tracks: Sequence[dict], path: str) -> None:
    """np.save(video_file + '.npy', …) — reference dump format."""
    np.save(path, np.array(tracks))


def load_tracks(path: str) -> List[dict]:
    return list(np.load(path, allow_pickle=True))
