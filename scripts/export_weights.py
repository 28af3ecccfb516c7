#!/usr/bin/env python
"""Export a TrainState checkpoint (orbax dir) to a shippable weight artifact.

--out *.npz  → compact variables npz: params (f16) + batch_stats (f32) only
               (the optimizer state and step stay in the orbax dir).
--out *.pth  → torch state dict loadable by the REFERENCE repo's models
               (net.load_state_dict semantics, pyramid.py:353-364) — the
               reverse interop direction.

Example:
  python scripts/export_weights.py --checkpoint weights_of_mine/try3_pyramid_3000 \
      --out net_weight/try3_mini.npz --net try3 --check
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse

from fdt.models.loader import (load_variables, save_variables_npz,
                               save_variables_pth)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True, help="orbax TrainState dir")
    ap.add_argument("--out", required=True, help="output .npz path")
    ap.add_argument("--net", default="try3",
                    help="variant for the optional --check forward")
    ap.add_argument("--check", action="store_true",
                    help="reload the npz and run a detection forward on the "
                         "sample image (CPU)")
    args = ap.parse_args()

    variables = load_variables(None, args.checkpoint, 0)
    if args.out.endswith((".pth", ".pt")):
        save_variables_pth(variables, args.out)
    else:
        save_variables_npz(variables, args.out)
    print(f"wrote {args.out} ({_os.path.getsize(args.out) / 1e6:.1f} MB)")

    if args.check:
        import jax
        jax.config.update("jax_platforms", "cpu")
        import cv2
        from fdt.models.loader import load_pyramidbox_detector
        det = load_pyramidbox_detector(args.net, args.out)
        img = cv2.imread("/root/reference/image_and_anno/test_image/try1/"
                         "try1_thresh_0.39_13.jpg")
        img = cv2.resize(img, (640, 640))
        rows = det.detect_face(img, threshold=0.35)
        print(f"check: {len(rows)} detections >= 0.35 on the sample image")


if __name__ == "__main__":
    main()
