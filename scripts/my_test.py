#!/usr/bin/env python
"""PyramidBox WIDER-FACE val evaluation (reference My_test.py CLI).

Example:
  python scripts/my_test.py --net repo --weights net_weight/Res50_pyramid.pth \
      --anno image_and_anno/anno/gen_anno_file_val --threshold 0
Writes draw_curve/data/data_of_<net>.npy in the reference dump layout.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse

from fdt.eval.runner import eval_pyramidbox
from fdt.models.loader import load_pyramidbox_detector


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", default="repo",
                    choices=["repo", "try1", "try2", "try3", "try4", "try5"])
    ap.add_argument("--weights", default=None, help=".pth / orbax checkpoint")
    ap.add_argument("--threshold", default=0.0, type=float)
    ap.add_argument("--anno", default="./image_and_anno/anno/gen_anno_file_val")
    ap.add_argument("--data_save_folder", default="./draw_curve/data/")
    ap.add_argument("--display_dir", default=None,
                    help="write annotated images here (headless)")
    ap.add_argument("--display", action="store_true",
                    help="live GT/pred window; 's' saves a snapshot "
                         "(My_test.py:144-161)")
    ap.add_argument("--img_save_folder", default="./image_and_anno/test_image/")
    ap.add_argument("--limit", default=None, type=int)
    ap.add_argument("--process_index", default=None, type=int,
                    help="multi-process eval: this process's contiguous "
                         "record shard; writes a raw .npz part file to merge "
                         "with scripts/merge_eval.py")
    ap.add_argument("--process_count", default=None, type=int)
    args = ap.parse_args()
    # persistent XLA cache for the TPU backend (multi-minute compiles
    # on this host; no-op on CPU — fdt.utils.cache)
    from fdt.utils.cache import enable_tpu_compile_cache
    enable_tpu_compile_cache()

    det = load_pyramidbox_detector(args.net, args.weights)
    dump = eval_pyramidbox(det, args.anno, args.threshold,
                           dump_path=f"{args.data_save_folder}/data_of_{args.net}.npy",
                           display_dir=args.display_dir, display=args.display,
                           snapshot_dir=args.img_save_folder,
                           snapshot_prefix=f"{args.net}_thresh_{args.threshold}",
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
