#!/usr/bin/env python
"""Offline multi-face IoU tracking over a video (reference iouTracke_cal.py CLI).

Saves <video>.npy in the reference track format; replay with
scripts/track_display.py.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse

from fdt.models.loader import load_pyramidbox_detector
from fdt.track import save_tracks, track_video


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("video", help="video file (with extension)")
    ap.add_argument("--net", default="repo")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--batch", default=8, type=int)
    ap.add_argument("--out", default=None, help="defaults to <video stem>.npy")
    ap.add_argument("--device_tracker", action="store_true",
                    help="run the greedy association on device (lax.scan)")
    args = ap.parse_args()
    # persistent XLA cache for the TPU backend (multi-minute compiles
    # on this host; no-op on CPU — fdt.utils.cache)
    from fdt.utils.cache import enable_tpu_compile_cache
    enable_tpu_compile_cache()

    det = load_pyramidbox_detector(args.net, args.weights)
    tracks = track_video(args.video, det, batch_size=args.batch,
                         device_tracker=args.device_tracker)
    out = args.out or args.video.rsplit(".", 1)[0] + ".npy"
    save_tracks(tracks, out)
    print(f"{len(tracks)} tracks saved to {out}")


if __name__ == "__main__":
    main()
