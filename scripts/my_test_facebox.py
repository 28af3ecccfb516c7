#!/usr/bin/env python
"""FaceBoxes WIDER-FACE val evaluation (reference FACEBOX/My_test_facebox.py CLI)."""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse

from fdt.eval.runner import eval_facebox
from fdt.models.loader import load_facebox_detector


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default="/root/reference/FACEBOX/faceboxes.pt")
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

    det = load_facebox_detector(args.weights)
    dump = eval_facebox(det, args.anno,
                        dump_path=f"{args.data_save_folder}/data_of_facebox.npy",
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
