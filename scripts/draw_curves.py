#!/usr/bin/env python
"""Plot PR/ROC overlays or training-loss curves from dump files
(reference draw_curve/draw_pr_roc.py and draw_curve/draw_loss.py)."""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("pr_roc", help="PR + ROC overlay from eval dumps")
    pr.add_argument("dumps", nargs="+", help="data_of_<net>.npy files")
    pr.add_argument("--labels", nargs="*", default=None)
    pr.add_argument("--out", default="curves")

    ls = sub.add_parser("loss", help="assembled training-loss curve")
    ls.add_argument("dumps", nargs="+", help="<name>_loss_<iter>.npy files in order")
    ls.add_argument("--index", type=int, default=0,
                    help="0 total, 1 face_loc, 2 face_conf, 3 head_loc, 4 head_conf")
    ls.add_argument("--smooth", type=int, default=1)
    ls.add_argument("--eval", action="store_true", dest="iseval")
    ls.add_argument("--out", default="loss.png")
    args = ap.parse_args()

    if args.cmd == "pr_roc":
        from fdt.eval.curves import plot_pr_roc
        labels = args.labels or [d.split("data_of_")[-1].removesuffix(".npy")
                                 for d in args.dumps]
        plot_pr_roc(args.dumps, labels, out_prefix=args.out)
        from fdt.eval.pr import average_precision
        for d, l in zip(args.dumps, labels):
            print(f"{l}: AP = {average_precision(np.load(d)):.4f}")
        print(f"wrote {args.out}_pr.png / {args.out}_roc.png")
    else:
        from fdt.eval.curves import assemble_loss, plot_curves
        series = assemble_loss(args.dumps, index=args.index,
                               smooth=args.smooth, iseval=args.iseval)
        plot_curves([series], ["loss"], "training loss", "iteration", "loss",
                    out_path=args.out)
        print(f"wrote {args.out} ({series.shape[0]} points)")


if __name__ == "__main__":
    main()
