"""Stage-time breakdown of the device MTCNN cascade (bench diagnosis tool).

Times the vmapped cascade truncated at each stage (pnet / rnet / onet) so the
stage deltas attribute the per-batch cost, optionally at several matmul
precisions (the cascade defaults to 'highest' for oracle parity; 'default'
rides the MXU at bf16-multiply speed).  Companion of profile_flagship.py for
the MTCNN bench config (480x640, batch 8).
"""
import argparse
import functools
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, args, iters=10, reps=3):
    r = fn(*args)
    jax.block_until_ready(r)
    float(np.asarray(r))  # settle the tunnel (block_until_ready alone
    best = np.inf         # returns early under the axon remote backend)
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        jax.block_until_ready(r)
        float(np.asarray(r))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--hw", default="480x640")
    ap.add_argument("--precisions", default="highest,default")
    args = ap.parse_args()
    # persistent XLA cache for the TPU backend (multi-minute compiles
    # on this host; no-op on CPU — fdt.utils.cache)
    from fdt.utils.cache import enable_tpu_compile_cache
    enable_tpu_compile_cache()
    h, w = (int(v) for v in args.hw.split("x"))

    from bench import _sample_frame, MTCNN_P
    from fdt.infer.mtcnn_device import load_device_cascade, build_plan

    frame = _sample_frame(h, w)
    imgs = jax.device_put(
        np.broadcast_to(frame, (args.batch, h, w, 3)).copy())

    for prec in args.precisions.split(","):
        dev = load_device_cascade(MTCNN_P, MTCNN_P.replace("pnet", "rnet"),
                                  MTCNN_P.replace("pnet", "onet"),
                                  precision=prec)
        plan = build_plan(h, w, dev.cfg.min_face_size, dev.cfg.scale_factor,
                          dev.cfg.cell_size, dev.cfg.stride, None)
        print(f"precision={prec}  ({args.batch}x{h}x{w}, "
              f"{len(plan.levels)} pyramid levels)")
        prev = 0.0
        for stage in ("pnet", "rnet", "onet"):
            cascade = jax.vmap(
                functools.partial(dev._cascade, plan, stage=stage),
                in_axes=(None, 0))

            @jax.jit
            def run(variables, images, _c=cascade):
                b, lm, cnt, _sat = _c(variables, images)
                return (jnp.sum(jnp.where(jnp.isfinite(b), b, 0.0))
                        + jnp.sum(cnt)).astype(jnp.float32)

            ms = bench(run, (dev.vars, imgs), args.iters)
            ips = args.batch / (ms / 1e3)
            print(f"  thru {stage:>5}: {ms:8.2f} ms/batch  (+{ms - prev:7.2f})"
                  f"  {ips:7.1f} img/s")
            prev = ms


if __name__ == "__main__":
    main()
