#!/usr/bin/env python
"""Train PyramidBox (reference MyTrain_repo.py / MyTrain_mobile.py CLI).

Examples:
  python scripts/train_pyramid.py --net repo --batch_size 7 --lr 2e-5
  python scripts/train_pyramid.py --net try3 --batch_size 16 --lr 1e-4 \
      --momentum 0.3 --eval_freq 500 --train_pretrain 5000
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse

import jax

from fdt.models.loader import load_variables
from fdt.models.pyramidbox_mobile import build_pyramidbox
from fdt.train.driver import TrainConfig, run_pyramid_training
from fdt.train.loops import PyramidTrainer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", default="repo",
                    choices=["repo", "try1", "try2", "try3", "try4", "try5"])
    ap.add_argument("--batch_size", default=7, type=int)
    ap.add_argument("--lr", default=2e-5, type=float)
    ap.add_argument("--momentum", default=0.6, type=float)
    ap.add_argument("--iter", default=120000, type=int)
    ap.add_argument("--save_point", default=3000, type=int)
    ap.add_argument("--start_iter", default=0, type=int)
    ap.add_argument("--resume", default=None, help=".pth or orbax checkpoint")
    ap.add_argument("--eval_freq", default=0, type=int)
    ap.add_argument("--stall_timeout", default=0, type=float,
                    help="seconds without synced step progress before the "
                         "process hard-exits 86 (a lost tunnel execution "
                         "blocks forever otherwise); 0 disables; the first "
                         "step (compiles) is exempt.  train_chained.py "
                         "retries an exit-86 chunk from its checkpoint")
    ap.add_argument("--startup_timeout", default=0, type=float,
                    help="like --stall_timeout but for a wedge BEFORE the "
                         "first synced step (backend init / checkpoint "
                         "restore / compiles) — budget several times "
                         "--stall_timeout; 0 disables")
    ap.add_argument("--train_pretrain", default=0, type=int,
                    help="freeze backbone before this iter (mobile nets)")
    ap.add_argument("--input_size", default=640, type=int,
                    help="train resolution (reference trains at 640; smaller "
                         "sizes are for smoke runs on slow backends)")
    ap.add_argument("--bf16", action="store_true",
                    help="mixed-precision training: bf16 forward/backward "
                         "compute, f32 params/optimizer/loss (flax "
                         "param_dtype stays float32)")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize activations in the backward pass: "
                         "per-Bottleneck segmented nn.remat on the flagship "
                         "(only block-boundary activations stay live), "
                         "whole-forward jax.checkpoint on mobile variants; "
                         "trades recompute FLOPs for activation HBM — bigger "
                         "batches per chip, same gradients")
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                    help="pin the jax backend (config.update — env vars are "
                         "not read here, jax is pre-imported); cpu makes the "
                         "run hermetic to a wedged TPU tunnel; tpu is the "
                         "default backend already (the plugin may register "
                         "under a different platform name, so it is NOT "
                         "pinned by name — we just leave the default)")
    ap.add_argument("--dp_devices", default=0, type=int,
                    help="data-parallel mesh size (0 = single device); "
                         "batches shard over the mesh `data` axis")
    ap.add_argument("--sp_devices", default=1, type=int,
                    help="spatial-partition mesh size: shards the image "
                         "HEIGHT axis (conv halo exchanges inserted by the "
                         "SPMD partitioner) over a 2-D data x space mesh; "
                         "for inputs whose activations exceed one chip's HBM")
    ap.add_argument("--num_processes", default=1, type=int,
                    help="multi-process DP (fdt.dist.multihost): launch this "
                         "script once per process with distinct --process_id; "
                         "the mesh spans all processes' devices and the "
                         "global batch is num_processes x batch_size")
    ap.add_argument("--process_id", default=0, type=int)
    ap.add_argument("--coordinator", default="127.0.0.1:12360",
                    help="process-0 coordinator address for --num_processes>1")
    ap.add_argument("--max_gt", default=None, type=int,
                    help="GT pad bucket (required for --num_processes>1: "
                         "per-process pads must agree)")
    ap.add_argument("--journal", default=None,
                    help="replay a journal schedule from draw_curve/log "
                         "(repo | try3 | try1): re-execs through "
                         "scripts/train_chained.py, which runs each phase's "
                         "lr/momentum/batch_size as a chained process — the "
                         "reference's own restart protocol")
    ap.add_argument("--annoPath", default="./image_and_anno/anno/gen_anno_file_train")
    ap.add_argument("--evalAnnoPath", default="./image_and_anno/anno/gen_anno_file_val")
    ap.add_argument("--save_folder", default="weights_of_mine/")
    args = ap.parse_args()

    if args.journal:
        # one-command journal repro (VERDICT r3 item 8): the journal's
        # momentum/lr/batch changes are restart boundaries in the reference
        # too, so the chained runner is the faithful mechanism
        import subprocess
        cmd = [_sys.executable,
               _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                             "train_chained.py"),
               "--net", args.net, "--journal", args.journal,
               "--iter", str(args.iter), "--start_iter", str(args.start_iter),
               "--save_folder", args.save_folder,
               "--annoPath", args.annoPath]
        if args.resume:
            cmd += ["--resume", args.resume]
        # NOT --save_point: the chained runner derives it per chunk (the
        # resume contract names checkpoints by chunk end)
        cmd += ["--input_size", str(args.input_size)]
        if args.platform:
            cmd += ["--platform", args.platform]
        if args.stall_timeout:
            cmd += ["--stall_timeout", str(args.stall_timeout)]
        if args.startup_timeout:
            cmd += ["--startup_timeout", str(args.startup_timeout)]
        raise SystemExit(subprocess.call(cmd))

    if args.platform == "cpu":
        # only cpu is pinned by name: the TPU plugin on this host registers
        # as platform 'axon', so jax_platforms="tpu" would fail to init —
        # the TPU is the default backend whenever the plugin is present
        jax.config.update("jax_platforms", args.platform)
    mesh = None
    if args.num_processes > 1:
        # MUST run before anything that initializes the XLA backend —
        # enable_tpu_compile_cache() below calls jax.default_backend(),
        # which jax.distributed.initialize() forbids happening first
        # (caught by tests/test_multihost.py::test_two_process_training_cli)
        from fdt.dist import multihost
        multihost.initialize(args.coordinator, args.num_processes,
                             args.process_id)
    # warm-start the multi-minute 640² fwd+bwd compile across chained
    # restarts (scripts/train_chained.py runs one process per chunk; without
    # the cache every chunk re-pays the full compile); TPU backend only
    from fdt.utils.cache import enable_tpu_compile_cache
    enable_tpu_compile_cache()
    if args.sp_devices > 1:
        if args.num_processes > 1:
            raise SystemExit("--sp_devices requires single-process runs "
                             "(spatial shards must be process-local)")
        from fdt.dist import make_mesh_2d
        mesh = make_mesh_2d(args.dp_devices or 1, args.sp_devices)
    elif args.num_processes > 1 or args.dp_devices:
        from fdt.dist import make_mesh
        mesh = make_mesh(args.dp_devices or None)
    import jax.numpy as jnp
    model = build_pyramidbox(args.net,
                             dtype=jnp.bfloat16 if args.bf16 else None,
                             remat=args.remat and args.net == "repo")
    freeze = (lambda p: "features" in p) if args.net in ("try3", "try4", "try5") else None
    trainer = PyramidTrainer(model, args.net, momentum=args.momentum,
                             input_size=args.input_size,
                             freeze_predicate=freeze,
                             remat=args.remat and args.net != "repo")
    # abstract=True: bit-identical to the compiled init path (pinned by
    # tests/test_train_driver.py) from a shape-only trace — saves a separate
    # multi-minute init compile before the train-step compile on slow hosts
    state = trainer.init_state(jax.random.PRNGKey(0), abstract=True)
    if args.resume:
        if _os.path.isdir(args.resume):  # orbax: full TrainState (opt + step)
            from fdt.train.checkpoint import restore_checkpoint
            state = restore_checkpoint(args.resume, state)
        else:  # torch .pth / variables .npz: params + batch_stats only
            variables = load_variables(model, args.resume, trainer.input_size)
            state = state.replace(params=variables["params"],
                                  batch_stats=variables["batch_stats"])

    cfg = TrainConfig(batch_size=args.batch_size, lr=args.lr,
                      total_iters=args.iter, save_point=args.save_point,
                      eval_freq=args.eval_freq, train_pretrain=args.train_pretrain,
                      start_iter=args.start_iter, save_folder=args.save_folder,
                      max_gt=args.max_gt, name=f"{args.net}_pyramid",
                      stall_timeout=args.stall_timeout,
                      startup_timeout=args.startup_timeout)
    run_pyramid_training(trainer, state, args.annoPath, cfg,
                         val_anno=args.evalAnnoPath if args.eval_freq else None,
                         mesh=mesh)


if __name__ == "__main__":
    main()
