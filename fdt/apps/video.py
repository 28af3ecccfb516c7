"""Realtime / file video demos for all three detector families.

Library equivalents of the reference webcam loops (Video.py:106-129,
FACEBOX/Video.py:56-78, MTCNN/Video.py:53-74): capture → per-frame detect →
box + fps overlay.  Works headless by writing an output video; pass
display=True for a cv2.imshow window when a display is present.
"""
from __future__ import annotations

import time
from typing import Callable

import numpy as np

RED = (0, 0, 255)


def _overlay(frame, rows, fps, landmarks=None):
    import cv2
    for box in rows:
        b = box[:4].astype(np.int32)
        cv2.rectangle(frame, (b[0], b[1]), (b[2], b[3]), RED, 1)
        cv2.putText(frame, f"{box[4]:.3f}", (b[0], b[1] - 2),
                    cv2.FONT_HERSHEY_PLAIN, 0.8, RED, 1)
    if landmarks is not None:
        for lm in landmarks:
            for k in range(0, 10, 2):
                cv2.circle(frame, (int(lm[k]), int(lm[k + 1])), 2, (0, 255, 0), -1)
    cv2.putText(frame, f"fps: {fps:.1f}", (5, 15), cv2.FONT_HERSHEY_PLAIN,
                1.0, (255, 255, 255), 1)
    return frame


def run_video(detect_fn: Callable[[np.ndarray], tuple], source=0,
              frame_size=(640, 480), out_path: str | None = None,
              display: bool = False, max_frames: int | None = None) -> float:
    """Generic demo loop; detect_fn(frame) → ([N,5] rows, landmarks|None).
    Returns average FPS."""
    import cv2
    cap = cv2.VideoCapture(source)
    writer = None
    n, t_total = 0, 0.0
    while True:
        ret, frame = cap.read()
        if not ret or (max_frames is not None and n >= max_frames):
            break
        frame = cv2.resize(frame, frame_size)
        t0 = time.time()
        rows, landmarks = detect_fn(frame)
        dt = time.time() - t0
        n += 1
        t_total += dt
        frame = _overlay(frame, rows, 1.0 / max(dt, 1e-6), landmarks)
        if out_path and writer is None:
            writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"),
                                     25, frame_size)
        if writer is not None:
            writer.write(frame)
        if display:  # pragma: no cover
            cv2.imshow("fdt", frame)
            if cv2.waitKey(1) == 27:
                break
    cap.release()
    if writer is not None:
        writer.release()
    return n / t_total if t_total else 0.0


def pyramidbox_demo(detector, threshold: float = 0.4, **kw):
    """Video.py:106-129 equivalent (PyramidBox at 640×480)."""
    def detect(frame):
        return detector.detect_face(frame, threshold, nms_thresh=0.35), None
    return run_video(detect, **kw)


def facebox_demo(detector, **kw):
    """FACEBOX/Video.py equivalent."""
    def detect(frame):
        boxes, probs = detector.detect(frame)
        rows = (np.column_stack([boxes, probs]) if len(probs)
                else np.empty((0, 5)))
        return rows, None
    return run_video(detect, **kw)


def mtcnn_demo(detector, **kw):
    """MTCNN/Video.py equivalent (boxes + 5-point landmarks)."""
    def detect(frame):
        boxes, landmarks = detector.detect_face(frame)
        if not boxes.size:
            return np.empty((0, 5)), None
        return boxes, landmarks
    return run_video(detect, **kw)
