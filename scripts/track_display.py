#!/usr/bin/env python
"""Replay saved tracks over a video (reference iouTracke_display.py CLI)."""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse

from fdt.track import load_tracks
from fdt.track.display import render_tracks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("video")
    ap.add_argument("--tracks", default=None, help="defaults to <video stem>.npy")
    ap.add_argument("--out", default=None, help="output video (headless)")
    ap.add_argument("--display", action="store_true")
    args = ap.parse_args()

    tracks = load_tracks(args.tracks or args.video.rsplit(".", 1)[0] + ".npy")
    n = render_tracks(args.video, tracks, out_path=args.out, display=args.display)
    print(f"rendered {n} frames, {len(tracks)} tracks")


if __name__ == "__main__":
    main()
