#!/usr/bin/env python
"""Generate MTCNN stage training data (reference MTCNN/mtcnn/data_preprocess/).

Stages:
  pnet  random-crop patch factory from WIDER annotations
  rnet  hard examples mined with a trained P-Net
  onet  hard examples mined with trained P+R-Nets
  assemble  merge/subsample stage anno lists into one training file
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse

import numpy as np

from fdt.data.mtcnn_data import (assemble_annotations, gen_hard_example_data,
                                 gen_pnet_train_data)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stage", choices=["pnet", "rnet", "onet", "assemble"])
    ap.add_argument("--anno", help="WIDER-style anno (path x1 y1 x2 y2 …)")
    ap.add_argument("--prefix", default="")
    ap.add_argument("--out", default="mtcnn_data/")
    ap.add_argument("--pnet_ckpt", default=None)
    ap.add_argument("--rnet_ckpt", default=None)
    ap.add_argument("--files", nargs="*", help="anno lists for assemble")
    ap.add_argument("--seed", default=0, type=int)
    args = ap.parse_args()

    if args.stage == "assemble":
        n = assemble_annotations(args.out, args.files,
                                 np.random.RandomState(args.seed))
        print(f"assembled {n} lines into {args.out}")
        return
    if args.stage == "pnet":
        st = gen_pnet_train_data(args.anno, args.prefix, args.out,
                                 np.random.RandomState(args.seed))
    else:
        from fdt.infer.mtcnn import load_mtcnn_detector
        base = "/root/reference/MTCNN/original_model"
        det = load_mtcnn_detector(args.pnet_ckpt or f"{base}/pnet_epoch.pt",
                                  args.rnet_ckpt or f"{base}/rnet_epoch.pt",
                                  f"{base}/onet_epoch.pt")
        if args.stage == "rnet":
            def detect(img):
                _, aligned = det.detect_pnet(img)
                return aligned
            size = 24
        else:
            def detect(img):
                _, aligned = det.detect_pnet(img)
                if aligned is None:
                    return None
                _, aligned = det.detect_rnet(img, aligned)
                return aligned
            size = 48
        st = gen_hard_example_data(detect, args.anno, args.prefix, args.out, size)
    print(f"pos {st.pos} neg {st.neg} part {st.part}")


if __name__ == "__main__":
    main()
