#!/usr/bin/env python
"""Chain train_pyramid.py as a sequence of bounded-lifetime processes.

Long single-process training runs over this environment's TPU tunnel degrade:
the tunnel client leaks host memory proportional to uploaded bytes (~55 MB
per 8x640^2 batch), and step time grows 2s -> 20s+ once RSS crosses ~80 GB.
Chaining chunks through the checkpoint/resume contract (the reference's
--resume/--start_iter restart protocol, MyTrain_repo.py:31-33 + README.md:82)
bounds each process's lifetime with zero training-semantics change: orbax
restores the full TrainState (params, optimizer momentum, step), so a chained
run produces the same iterate sequence as a single process.

Example (ResNet50 teacher on the mini dataset, 1500 iters in 3 processes):
  python scripts/train_chained.py --net repo --chunk 500 --iter 1500 \
      --batch_size 8 --lr 2e-5 --momentum 0.6 \
      --annoPath data/mini/gen_anno_file_mini_train --save_folder weights_of_mine/
"""
import argparse
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", default=500, type=int,
                    help="iterations per process")
    ap.add_argument("--net", default="repo")
    ap.add_argument("--iter", default=1500, type=int)
    ap.add_argument("--start_iter", default=0, type=int)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--save_folder", default="weights_of_mine/")
    args, passthrough = ap.parse_known_args()

    name = f"{args.net}_pyramid"
    start = args.start_iter
    resume = args.resume
    while start < args.iter:
        end = min(start + args.chunk, args.iter)
        cmd = [sys.executable, os.path.join(HERE, "train_pyramid.py"),
               "--net", args.net, "--iter", str(end),
               "--start_iter", str(start),
               # run_pyramid_training saves on absolute iteration %
               # save_point AND unconditionally at total_iters (driver.py),
               # so {save_folder}/{name}_{end} exists for every chunk even
               # when end is not a multiple of (end - start)
               "--save_point", str(end - start),
               "--save_folder", args.save_folder] + passthrough
        if resume:
            cmd += ["--resume", resume]
        print(f"# chunk {start}..{end}: {' '.join(cmd)}", flush=True)
        rc = subprocess.call(cmd)
        if rc != 0:
            sys.exit(rc)
        resume = os.path.join(args.save_folder, f"{name}_{end}")
        start = end
    print(f"# chained training done: {resume}")


if __name__ == "__main__":
    main()
