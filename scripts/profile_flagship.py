"""Stage-time breakdown of the flagship detect step (bench diagnosis tool).

Times forward / +decode / +top_k / full-detect variants of the same jitted
graph on the current default device, printing a per-batch ms table.  Used to
attribute the gap between forward-only and full-detect throughput (VERDICT r2
item 3); keep it runnable — the numbers in BENCH notes come from here.
"""
import argparse
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, args, iters=20, reps=3):
    r = fn(*args)
    jax.block_until_ready(r)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--budget", type=int, default=5000)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    # persistent XLA cache for the TPU backend (multi-minute compiles
    # on this host; no-op on CPU — fdt.utils.cache)
    from fdt.utils.cache import enable_tpu_compile_cache
    enable_tpu_compile_cache()

    from bench import _sample_frame
    from fdt.anchors import pyramid_face_priors
    from fdt.config import PYRAMID_CONFIGS
    from fdt.geometry import decode
    from fdt.geometry.nms import nms_padded
    from fdt.infer.detect import ssd_detect
    from fdt.models.pyramidbox_mobile import build_pyramidbox
    from fdt.models.shapes import trace_source_shapes
    import dataclasses

    size = 640
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else None
    model = build_pyramidbox("repo", dtype=dt)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)))
    variables = jax.device_put(variables)
    shapes = trace_source_shapes(model, variables, size, size)
    priors = jnp.asarray(pyramid_face_priors(PYRAMID_CONFIGS["repo"], shapes,
                                             size, size))
    cfg = dataclasses.replace(PYRAMID_CONFIGS["repo"].detect,
                              conf_thresh=0.35, nms_thresh=0.35)
    mean = jnp.asarray([104.0, 117.0, 123.0], jnp.float32)
    images = jax.device_put(np.broadcast_to(
        _sample_frame(size, size), (args.batch, size, size, 3)).copy())

    def fwd(variables, images):
        x = images.astype(jnp.float32) - mean
        out = model.apply(variables, x)
        return out["face_loc"], out["face_conf"]

    @jax.jit
    def t_forward(variables, images):
        loc, conf = fwd(variables, images)
        return (jnp.sum(loc.astype(jnp.float32))
                + jnp.sum(conf.astype(jnp.float32)))

    @jax.jit
    def t_decode(variables, images):
        loc, conf = fwd(variables, images)
        conf = jax.nn.softmax(conf, axis=-1)
        boxes = decode(loc, priors, cfg.variance)
        return jnp.sum(boxes.astype(jnp.float32)) + jnp.sum(conf.astype(jnp.float32))

    @jax.jit
    def t_topk(variables, images):
        loc, conf = fwd(variables, images)
        conf = jax.nn.softmax(conf, axis=-1)
        boxes = decode(loc, priors, cfg.variance)
        k = min(args.budget, boxes.shape[1])

        def one(boxes_i, scores_i):
            s = jnp.where(scores_i > cfg.conf_thresh, scores_i, -jnp.inf)
            ts, order = jax.lax.top_k(s, k)
            return jnp.sum(ts.astype(jnp.float32)) + jnp.sum(boxes_i[order])
        return jnp.sum(jax.vmap(one)(boxes, conf[:, :, 1]))

    @jax.jit
    def t_full(variables, images):
        loc, conf = fwd(variables, images)
        conf = jax.nn.softmax(conf, axis=-1)
        return jnp.sum(ssd_detect(loc, conf, priors, cfg,
                                  budget=args.budget)).astype(jnp.float32)

    rows = [("forward", t_forward), ("+decode/softmax", t_decode),
            ("+topk", t_topk), ("full detect", t_full)]
    prev = 0.0
    for name, fn in rows:
        ms = bench(fn, (variables, images), args.iters)
        ips = args.batch / (ms / 1e3)
        print(f"{name:>16}: {ms:8.2f} ms/batch  (+{ms - prev:6.2f})  "
              f"{ips:8.1f} img/s")
        prev = ms


if __name__ == "__main__":
    main()
