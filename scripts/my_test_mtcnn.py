#!/usr/bin/env python
"""MTCNN WIDER-FACE val evaluation (reference MTCNN/My_test_mtcnn.py CLI)."""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import dataclasses

from fdt.config import MTCNN
from fdt.eval.runner import eval_mtcnn
from fdt.infer.mtcnn import load_mtcnn_detector


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pnet", default="/root/reference/MTCNN/original_model/pnet_epoch.pt")
    ap.add_argument("--rnet", default="/root/reference/MTCNN/original_model/rnet_epoch.pt")
    ap.add_argument("--onet", default="/root/reference/MTCNN/original_model/onet_epoch.pt")
    ap.add_argument("--min_face", default=24.0, type=float)  # My_test_mtcnn.py:13
    ap.add_argument("--anno", default="./image_and_anno/anno/gen_anno_file_val")
    ap.add_argument("--data_save_folder", default="./draw_curve/data/")
    ap.add_argument("--limit", default=None, type=int)
    ap.add_argument("--process_index", default=None, type=int,
                    help="multi-process eval shard; merge part files with "
                         "scripts/merge_eval.py")
    ap.add_argument("--process_count", default=None, type=int)
    args = ap.parse_args()
    # persistent XLA cache for the TPU backend (multi-minute compiles
    # on this host; no-op on CPU — fdt.utils.cache)
    from fdt.utils.cache import enable_tpu_compile_cache
    enable_tpu_compile_cache()

    cfg = dataclasses.replace(MTCNN, min_face_size=args.min_face)
    det = load_mtcnn_detector(args.pnet, args.rnet, args.onet, cfg)
    dump = eval_mtcnn(det, args.anno,
                      dump_path=f"{args.data_save_folder}/data_of_mtcnn.npy",
                      limit=args.limit, process_index=args.process_index,
                      process_count=args.process_count)
    from fdt.eval.pr import average_precision
    shard = ("" if not args.process_count or args.process_count <= 1 else
             f"  [shard {args.process_index}/{args.process_count} only - "
             "merge part files with scripts/merge_eval.py]")
    print(f"detections: {dump.shape[1] - 1}  gt: {int(dump[1, -1])}  "
          f"AP: {average_precision(dump):.4f}{shard}")


if __name__ == "__main__":
    main()
