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

--journal <name> replays a schedule from the reference's handwritten
experiment journal (draw_curve/log:1-24) as one command: each journal phase
(lr / momentum / batch_size over an iteration range) becomes a chained
process with those flags — exactly how the reference author ran them (the
journal phases are restart boundaries there too).  --journal-scale shrinks
every phase boundary for smoke runs.

Examples:
  # ResNet50 teacher on the mini dataset, 1500 iters in 3 processes:
  python scripts/train_chained.py --net repo --chunk 500 --iter 1500 \
      --batch_size 8 --lr 2e-5 --momentum 0.6 \
      --annoPath data/mini/gen_anno_file_mini_train --save_folder weights_of_mine/
  # the journal's full try3 recipe (lr 1e-4 -> 2e-5, batch 16 -> 14 @ 18k):
  python scripts/train_chained.py --net try3 --journal try3
"""
import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from fdt.utils.watchdog import STALL_EXIT_CODE

HERE = os.path.dirname(os.path.abspath(__file__))

# draw_curve/log:1-24, one dict per journal phase ("end" = last iteration of
# the phase; lr/momentum/batch_size = the flags logged for it).
JOURNAL = {
    # repo ResNet50 (log:20-23): momentum 0.3 -> 0.9 -> 0.6 across restarts
    "repo": [dict(end=9000, lr=1e-4, momentum=0.3, batch_size=7),
             dict(end=15000, lr=2e-5, momentum=0.9, batch_size=7),
             dict(end=120000, lr=2e-5, momentum=0.6, batch_size=7)],
    # try3 (log:13-15): lr drop + batch 16 -> 14 at 18k
    "try3": [dict(end=18000, lr=1e-4, momentum=0.3, batch_size=16),
             dict(end=24000, lr=2e-5, momentum=0.3, batch_size=14)],
    # try1 final finetune (log:8-9)
    "try1": [dict(end=24000, lr=1e-4, momentum=0.3, batch_size=8),
             dict(end=36000, lr=2e-5, momentum=0.6, batch_size=8)],
}


def journal_phases(name: str, scale: float, total_cap: int | None):
    """Journal phases with boundaries scaled (smoke runs) and optionally
    capped; phases starting past the cap drop out."""
    phases = []
    for p in JOURNAL[name]:
        p = dict(p, end=max(1, int(round(p["end"] * scale))))
        if total_cap is not None:
            p["end"] = min(p["end"], total_cap)
        if not phases or p["end"] > phases[-1]["end"]:
            phases.append(p)
    return phases


def run_chunk(cmd, stall_retries: int, label: str = "", resume=None,
              call=subprocess.call) -> int:
    """Run one chunk process; re-run it on the stall watchdog's exit code.

    A stalled chunk made no checkpoint past `resume`, so the retry command is
    IDENTICAL — it resumes from the same checkpoint and redoes at most one
    chunk of work.  Any other nonzero exit propagates (a real failure must
    abort the chain, not loop)."""
    retries = stall_retries
    while True:
        rc = call(cmd)
        if rc == STALL_EXIT_CODE and retries > 0:
            retries -= 1
            print(f"# chunk {label} stalled (exit {rc}); retrying from "
                  f"{resume or 'scratch'} ({retries} retries left)",
                  flush=True)
            continue
        return rc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", default=500, type=int,
                    help="iterations per process")
    ap.add_argument("--net", default="repo")
    ap.add_argument("--iter", default=1500, type=int)
    ap.add_argument("--start_iter", default=0, type=int)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--save_folder", default="weights_of_mine/")
    ap.add_argument("--journal", default=None, choices=sorted(JOURNAL),
                    help="replay this journal schedule (draw_curve/log); "
                         "per-phase lr/momentum/batch_size override the "
                         "plain flags, --iter caps the total")
    ap.add_argument("--journal-scale", default=1.0, type=float,
                    help="scale journal phase boundaries (smoke runs)")
    ap.add_argument("--stall-retries", default=2, type=int,
                    help="re-run a chunk this many times when it exits with "
                         "the stall watchdog's code (86: a wedged tunnel "
                         "execution, fdt.utils.watchdog) — the retry resumes "
                         "from the same checkpoint, so at most one chunk of "
                         "work is redone; other failures still abort")
    args, passthrough = ap.parse_known_args()

    name = f"{args.net}_pyramid"
    if args.journal:
        phases = journal_phases(args.journal, args.journal_scale,
                                args.iter if args.iter else None)
    else:
        phases = [dict(end=args.iter)]

    start = args.start_iter
    resume = args.resume
    for phase in phases:
        if start >= phase["end"]:
            continue  # resumed past this phase
        phase_flags = []
        for k in ("lr", "momentum", "batch_size"):
            if k in phase:
                phase_flags += [f"--{k}", str(phase[k])]
        if args.journal:
            print(f"# journal {args.journal} phase to {phase['end']}: "
                  f"{' '.join(phase_flags)}", flush=True)
        while start < phase["end"]:
            end = min(start + args.chunk, phase["end"])
            cmd = [sys.executable, os.path.join(HERE, "train_pyramid.py"),
                   "--net", args.net, "--iter", str(end),
                   "--start_iter", str(start),
                   # run_pyramid_training saves on absolute iteration %
                   # save_point AND unconditionally at total_iters (driver.py),
                   # so {save_folder}/{name}_{end} exists for every chunk even
                   # when end is not a multiple of (end - start)
                   "--save_point", str(end - start),
                   "--save_folder", args.save_folder] \
                + phase_flags + passthrough
            if resume:
                cmd += ["--resume", resume]
            print(f"# chunk {start}..{end}: {' '.join(cmd)}", flush=True)
            rc = run_chunk(cmd, args.stall_retries,
                           label=f"{start}..{end}", resume=resume)
            if rc != 0:
                sys.exit(rc)
            resume = os.path.join(args.save_folder, f"{name}_{end}")
            start = end
    print(f"# chained training done: {resume}")


if __name__ == "__main__":
    main()
