#!/usr/bin/env python
"""Webcam / video detection demos (reference Video.py, FACEBOX/Video.py,
MTCNN/Video.py)."""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse

from fdt.apps.video import facebox_demo, mtcnn_demo, pyramidbox_demo


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--detector", default="pyramid",
                    choices=["pyramid", "facebox", "mtcnn"])
    ap.add_argument("--net", default="repo", help="pyramid variant")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--source", default="0", help="camera index or video path")
    ap.add_argument("--out", default=None)
    ap.add_argument("--display", action="store_true")
    ap.add_argument("--max_frames", default=None, type=int)
    args = ap.parse_args()
    source = int(args.source) if args.source.isdigit() else args.source
    kw = dict(source=source, out_path=args.out, display=args.display,
              max_frames=args.max_frames)

    if args.detector == "pyramid":
        from fdt.models.loader import load_pyramidbox_detector
        fps = pyramidbox_demo(load_pyramidbox_detector(args.net, args.weights), **kw)
    elif args.detector == "facebox":
        from fdt.models.loader import load_facebox_detector
        fps = facebox_demo(load_facebox_detector(
            args.weights or "/root/reference/FACEBOX/faceboxes.pt"), **kw)
    else:
        from fdt.infer.mtcnn import load_mtcnn_detector
        base = "/root/reference/MTCNN/original_model"
        fps = mtcnn_demo(load_mtcnn_detector(f"{base}/pnet_epoch.pt",
                                             f"{base}/rnet_epoch.pt",
                                             f"{base}/onet_epoch.pt"), **kw)
    print(f"average fps: {fps:.2f}")


if __name__ == "__main__":
    main()
