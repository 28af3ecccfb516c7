#!/usr/bin/env python
"""Train an MTCNN cascade stage (reference MTCNN/mtcnn/train_net/train_{p,r,o}_net.py)."""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse

from fdt.data.mtcnn_data import append_flipped_images, parse_mtcnn_imdb
from fdt.train.mtcnn_train import train_stage


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stage", choices=["pnet", "rnet", "onet"])
    ap.add_argument("--anno", required=True,
                    help="assembled anno file (see scripts/gen_mtcnn_data.py)")
    ap.add_argument("--prefix", default="")
    ap.add_argument("--epochs", default=10, type=int)
    ap.add_argument("--batch_size", default=512, type=int)
    ap.add_argument("--lr", default=0.01, type=float)
    ap.add_argument("--store", default="model_store/")
    ap.add_argument("--no-flip", action="store_true")
    args = ap.parse_args()
    # persistent XLA cache for the TPU backend (multi-minute compiles
    # on this host; no-op on CPU — fdt.utils.cache)
    from fdt.utils.cache import enable_tpu_compile_cache
    enable_tpu_compile_cache()

    imdb = parse_mtcnn_imdb(args.anno, args.prefix)
    if not args.no_flip:
        imdb = append_flipped_images(imdb)
    print(f"{len(imdb)} training records")
    train_stage(args.stage, imdb, args.epochs, args.batch_size,
                args.store, base_lr=args.lr)


if __name__ == "__main__":
    main()
