#!/usr/bin/env python
"""Generate + validate the one-line anno files (reference image_and_anno/anno/gen_anno.py)."""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse

from fdt.data.anno import generate_anno_file, validate_anno_file


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bbx_gt", help="wider_face_{train,val}_bbx_gt.txt")
    ap.add_argument("img_dir", help="images_{train,val} directory")
    ap.add_argument("out", help="output gen_anno_file path")
    args = ap.parse_args()
    n = generate_anno_file(args.bbx_gt, args.img_dir, args.out)
    print(f"generated {n} records")
    for msg in validate_anno_file(args.out):
        print(msg)
    print("test finished")


if __name__ == "__main__":
    main()
