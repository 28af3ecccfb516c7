"""Track playback renderer.

Port of iouTracke_display.py:18-80: replays saved tracks over the video, each
track getting a random HSV color at its start frame, drawing the current box
plus a persistent center-trace polyline on a drawboard composited via a
threshold mask.  Headless-friendly: writes an output video instead of imshow.
"""
from __future__ import annotations

import numpy as np


def render_tracks(video_path: str, tracks, out_path: str | None = None,
                  dis_width: int = 800, display: bool = False,
                  rng: np.random.RandomState | None = None,
                  max_frames: int | None = None) -> int:
    import cv2
    rng = rng or np.random.RandomState()
    cap = cv2.VideoCapture(video_path)
    ow = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    oh = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    fw = dis_width
    fh = int(oh * fw / ow)
    fps = cap.get(cv2.CAP_PROP_FPS) or 25

    tracks = [dict(t) for t in tracks]
    active = []
    drawboard = np.zeros((fh, fw, 3), np.uint8)
    w_ratio, h_ratio = fw / 640, fh / 480
    writer = None
    frame_num = 0
    while True:
        ret, image = cap.read()
        if not ret or (max_frames is not None and frame_num >= max_frames):
            break
        frame_num += 1
        image = cv2.resize(image, (fw, fh))
        for track in tracks:
            if track["start_frame"] == frame_num:
                track["color"] = cv2.cvtColor(
                    np.uint8([[(rng.randint(0, 360), 255, 255)]]),
                    cv2.COLOR_HSV2BGR)[0, 0].tolist()
                active.append(track)
        for i, track in enumerate(list(active)):
            idx = frame_num - track["start_frame"]
            if idx >= len(track["bboxes"]):
                active.remove(track)
            elif idx > 0:
                x10, y10, x20, y20 = track["bboxes"][idx - 1]
                x11, y11, x21, y21 = track["bboxes"][idx]
                c0 = (int(w_ratio * (x10 + x20) / 2), int(h_ratio * (y10 + y20) / 2))
                c1 = (int(w_ratio * (x11 + x21) / 2), int(h_ratio * (y11 + y21) / 2))
                pt1 = (int(w_ratio * x11), int(h_ratio * y11))
                pt2 = (int(w_ratio * x21), int(h_ratio * y21))
                thickness = int((x21 + y21 - y11 - x11) / 80) + 1
                drawboard = cv2.line(drawboard, c0, c1, track["color"], thickness)
                image = cv2.rectangle(image, pt1, pt2, track["color"], 1)
        mask = cv2.cvtColor(drawboard, cv2.COLOR_BGR2GRAY)
        _, mask = cv2.threshold(mask, 1, 255, cv2.THRESH_BINARY_INV)
        image = cv2.bitwise_and(image, image, mask=mask)
        image = cv2.add(image, drawboard)
        if out_path and writer is None:
            writer = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"),
                                     fps, (fw, fh))
        if writer is not None:
            writer.write(image)
        if display:  # pragma: no cover
            cv2.imshow("tracks", image)
            if cv2.waitKey(int(1000 / fps)) == 27:
                break
    cap.release()
    if writer is not None:
        writer.release()
    return frame_num
