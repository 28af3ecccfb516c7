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
    ap.add_argument("--host_cascade", action="store_true",
                    help="MTCNN only: use the host-loop cascade instead of "
                         "the single-jit device cascade")
    args = ap.parse_args()
    # persistent XLA cache for the TPU backend (multi-minute compiles
    # on this host; no-op on CPU — fdt.utils.cache)
    from fdt.utils.cache import enable_tpu_compile_cache
    enable_tpu_compile_cache()
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
        base = "/root/reference/MTCNN/original_model"
        paths = (f"{base}/pnet_epoch.pt", f"{base}/rnet_epoch.pt",
                 f"{base}/onet_epoch.pt")
        if args.host_cascade:
            from fdt.infer.mtcnn import load_mtcnn_detector
            det = load_mtcnn_detector(*paths)
        else:
            # fixed frame size → one compile; the whole cascade stays on device
            from fdt.infer.mtcnn_device import (FAST_BUDGETS, MID_BUDGETS,
                                                load_device_cascade)
            # budget ladder: typical scenes sweep the small tiers, crowded
            # frames escalate (sticky) — keep-set-identical either way
            det = load_device_cascade(
                *paths, fast_budgets=(FAST_BUDGETS, MID_BUDGETS))
        fps = mtcnn_demo(det, **kw)
    print(f"average fps: {fps:.2f}")


if __name__ == "__main__":
    main()
