"""Benchmark: framework throughput vs the CPU reference, all BASELINE configs.

Prints ONE JSON line whose primary metric is the flagship detector
(PyramidBox-ResNet50 640² full detect, NMS budget 5000 = the reference's
nms_top_k, layers/functions/detection.py:32), with `mfu` (model FLOP/s ÷ chip
peak from the compiled graph's cost analysis) and an `extras` dict carrying
the remaining BASELINE.md configs:

  facebox   — FaceBoxes 1024² detect (pretrained faceboxes.pt weights)
  mtcnn     — device-side 3-stage cascade, 640×480 frames (pretrained weights)
  try1/try3 — PyramidBox-Mobile 640² detect
  tracker   — PyramidBox 640×480 detect + IoU-tracker association per frame

`vs_baseline` values are throughput ratios against the PyTorch reference
running the SAME config on this host's CPU (the only hardware the reference
can use here; it publishes no numbers of its own — BASELINE.md).  Baselines
are measured once and cached in .bench_cache.json.

Timing protocol: inputs staged with device_put, outputs reduced to an
in-graph scalar checksum, one blocking readback at the end — this environment
reaches the TPU through a slow tunnel (~25MB/s), so per-iteration host fetches
would measure the tunnel, not the chip.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

# NOTE: no persistent compilation cache.  The env-var config
# (JAX_COMPILATION_CACHE_DIR) never took effect in this environment — jax is
# pre-imported at interpreter start, so env vars set by this script are never
# read — and enabling it via jax.config.update is hazardous for CPU-backend
# executables (XLA:CPU AOT reload trips a CPU-feature mismatch that can hang).
# TPU compiles here are ~20-40s each and run once per bench invocation.

CACHE = os.path.join(os.path.dirname(__file__), ".bench_cache.json")
SAMPLE_IMG = "/root/reference/image_and_anno/test_image/try1/try1_thresh_0.39_13.jpg"
MTCNN_P = "/root/reference/MTCNN/original_model/pnet_epoch.pt"
FACEBOX_PT = "/root/reference/FACEBOX/faceboxes.pt"

# bf16 peak FLOP/s per chip by device kind (MXU); used for the MFU figure.
PEAK_FLOPS = {"TPU v5 lite": 197e12, "TPU v5e": 197e12, "TPU v4": 275e12,
              "TPU v6 lite": 918e12, "TPU v6e": 918e12}


def _sample_frame(h, w):
    """A real image (realistic score distribution for NMS) resized to h×w."""
    import cv2
    if os.path.exists(SAMPLE_IMG):
        return cv2.resize(cv2.imread(SAMPLE_IMG), (w, h))
    rng = np.random.RandomState(0)
    return (rng.rand(h, w, 3) * 255).astype(np.uint8)


_SPREADS = {}  # config name → percent spread across timing repeats


def _time_checksum(fn, args, iters, reps=3, record=None):
    """Wall timing of a jitted scalar-returning fn: `reps` repeats of an
    `iters`-call block, reporting the BEST block (and recording the
    max/min spread so a drifting host/tunnel can't silently masquerade as a
    perf regression — VERDICT r2 item 3)."""
    import jax
    r = fn(*args)
    jax.block_until_ready(r)
    float(np.asarray(r))  # settle the tunnel
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        jax.block_until_ready(r)
        float(np.asarray(r))
        times.append(time.perf_counter() - t0)
    if record:
        _SPREADS[record] = round((max(times) / min(times) - 1) * 100, 1)
    return min(times)


def _cost_flops(lowered_compiled):
    try:
        ca = lowered_compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


TRY3_TRAINED = os.path.join(os.path.dirname(__file__), "net_weight",
                            "try3_mini.npz")


def measure_pyramidbox(batch, iters, dtype, budget, variant="repo", size=640,
                       want_mfu=False, record=None, weights=None, quant=None):
    import jax
    import jax.numpy as jnp
    from fdt.infer.pyramidbox import PyramidBoxDetector
    from fdt.models.pyramidbox_mobile import build_pyramidbox

    dt = {"bfloat16": jnp.bfloat16, "float32": None}[dtype]
    model = build_pyramidbox(variant, dtype=dt)
    if weights:
        from fdt.models.loader import load_variables
        variables = load_variables(model, weights, size)
    else:
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, size, size, 3)))
    det = PyramidBoxDetector(variables, model, variant, budget=budget,
                             precision="default" if dt is not None else "highest",
                             quant=quant)
    images = np.broadcast_to(_sample_frame(size, size), (batch, size, size, 3)).copy()
    run = det._compiled(size, size, 0.35, 0.35)

    @jax.jit
    def run_summed(variables, images):
        return jnp.sum(run(variables, images)).astype(jnp.float32)

    images = jax.device_put(images)
    full = jax.device_get(run(det.variables, images))    # compile + validate
    assert np.isfinite(full).all()
    dt_s = _time_checksum(run_summed, (det.variables, images), iters,
                          record=record or variant)
    ips = batch * iters / dt_s
    mfu = None
    if want_mfu:
        flops = _cost_flops(run_summed.lower(det.variables, images).compile())
        if flops:
            kind = jax.devices()[0].device_kind
            peak = PEAK_FLOPS.get(kind)
            if peak:
                mfu = (flops * iters / dt_s) / peak
    return ips, mfu


def measure_facebox(batch=16, iters=20):
    import jax
    import jax.numpy as jnp
    from fdt.infer.facebox import FaceBoxDetector
    from fdt.models.facebox import FaceBox
    from fdt.models.torch_convert import load_torch_state_dict, torch_to_flax

    model = FaceBox()
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3))))
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
    if os.path.exists(FACEBOX_PT):
        variables = torch_to_flax(load_torch_state_dict(FACEBOX_PT), template,
                                  strict=True)
    else:  # random weights if the checkpoint is missing
        variables = jax.tree.map(
            lambda z: np.asarray(jax.random.normal(
                jax.random.PRNGKey(0), z.shape, z.dtype)) * 0.05, template)
    det = FaceBoxDetector(variables, precision="default")
    s = det.cfg.input_size
    images = np.broadcast_to(_sample_frame(s, s), (batch, s, s, 3)).copy()

    @jax.jit
    def run_summed(variables, images):
        boxes, scores, count = det._detect_impl(variables, images)
        return (jnp.sum(boxes) + jnp.sum(scores) + jnp.sum(count)).astype(jnp.float32)

    images = jax.device_put(images)
    dt_s = _time_checksum(run_summed, (det.variables, images), iters,
                          record="facebox")
    return batch * iters / dt_s


def measure_mtcnn(batch=8, iters=10, h=480, w=640):
    import jax
    import jax.numpy as jnp
    from fdt.infer.mtcnn_device import load_device_cascade

    if not os.path.exists(MTCNN_P):
        return None
    dev = load_device_cascade(MTCNN_P, MTCNN_P.replace("pnet", "rnet"),
                              MTCNN_P.replace("pnet", "onet"))
    frame = _sample_frame(h, w)
    imgs = np.broadcast_to(frame, (batch, h, w, 3)).copy()
    # sanity: the cascade finds faces on the sample frame
    boxes, _ = dev.detect_face(frame)
    from fdt.infer.mtcnn_device import build_plan
    plan = build_plan(h, w, dev.cfg.min_face_size, dev.cfg.scale_factor,
                      dev.cfg.cell_size, dev.cfg.stride, None)
    import functools
    cascade = jax.vmap(functools.partial(dev._cascade, plan), in_axes=(None, 0))

    @jax.jit
    def run_summed(variables, images):
        b, lm, cnt, _sat = cascade(variables, images)
        return (jnp.sum(jnp.where(jnp.isfinite(b), b, 0.0))
                + jnp.sum(cnt)).astype(jnp.float32)

    imgs = jax.device_put(imgs)
    dt_s = _time_checksum(run_summed, (dev.vars, imgs), iters, record="mtcnn")
    return batch * iters / dt_s


def measure_train(batch=8, iters=10, size=640, dtype="float32"):
    """PyramidBox-ResNet50 train-step throughput (fwd+bwd+SGD, dual MultiBox
    loss).  Opt-in (--configs train / train_bf16): the 640² fwd+bwd compile
    takes ~10min through this environment's remote compile helper, too slow
    for the default bench line.  dtype="bfloat16" = mixed precision (bf16
    compute, f32 params/loss — the scripts/train_pyramid.py --bf16 path)."""
    import jax
    import jax.numpy as jnp
    from fdt.models.pyramidbox import PyramidBox
    from fdt.train import PyramidTrainer, pad_targets

    dt = {"bfloat16": jnp.bfloat16, "float32": None}[dtype]
    trainer = PyramidTrainer(PyramidBox(dtype=dt), "repo", input_size=size,
                             precision="default")
    state = jax.device_put(trainer.init_state(jax.random.PRNGKey(0),
                                              abstract=True))
    rng = np.random.RandomState(0)
    images = jax.device_put(rng.rand(batch, size, size, 3).astype(np.float32)
                            * 255)
    targets = [np.array([[0.1, 0.1, 0.4, 0.4, 0], [0.5, 0.5, 0.9, 0.9, 0]],
                        np.float32)] * batch
    gt = jax.device_put(pad_targets(targets, max_gt=8))
    # FLOPs from the UNCOMPILED lowering (compiling again just for
    # cost_analysis would repeat the ~10min 640² fwd+bwd compile; lowered
    # analysis counts the same matmul/conv FLOPs, it only misses fusion —
    # fine for an MFU estimate)
    flops = None
    try:
        ca = trainer.train_step.lower(state, images, *gt, 1e-4).cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass
    state, metrics = trainer.train_step(state, images, *gt, 1e-4)
    jax.block_until_ready(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = trainer.train_step(state, images, *gt, 1e-4)
    jax.block_until_ready(metrics["loss"])
    dt_s = time.perf_counter() - t0
    mfu = None
    if flops:
        peak = PEAK_FLOPS.get(jax.devices()[0].device_kind)
        if peak:
            mfu = (flops * iters / dt_s) / peak
    return batch * iters / dt_s, mfu


def measure_remat(batch=8, iters=10, size=640):
    """Opt-in (--configs train_remat): the PyramidBox-ResNet50 train step
    compiled plain vs two remat strategies, reporting XLA's measured
    temp-buffer (activation) memory and the step-time cost:
      * "full"   — one jax.checkpoint around the whole forward (measured
        NEARLY USELESS here: 0.95× temp for 1.2× time — the backward's
        full-forward recompute re-materializes everything at once);
      * "blocks" — per-Bottleneck segmented nn.remat (PyramidBox(remat=True),
        the scripts/train_pyramid.py --remat path): only block-boundary
        activations stay live."""
    import jax
    import jax.numpy as jnp
    from fdt.models.pyramidbox import PyramidBox
    from fdt.train import PyramidTrainer, pad_targets

    rng = np.random.RandomState(0)
    images_h = rng.rand(batch, size, size, 3).astype(np.float32) * 255
    targets = [np.array([[0.1, 0.1, 0.4, 0.4, 0], [0.5, 0.5, 0.9, 0.9, 0]],
                        np.float32)] * batch
    out = {}
    for name, remat in (("plain", False), ("full", "trainer"),
                        ("blocks", "model")):
        trainer = PyramidTrainer(PyramidBox(remat=remat == "model"), "repo",
                                 input_size=size, precision="default",
                                 remat=remat == "trainer")
        state = jax.device_put(trainer.init_state(jax.random.PRNGKey(0),
                                                  abstract=True))
        images = jax.device_put(images_h)
        gt = jax.device_put(pad_targets(targets, max_gt=8))
        # reuse the ONE AOT executable for memory_analysis AND the timed
        # steps — trainer.train_step(...) would jit-compile a second copy of
        # the same ~10min 640² fwd+bwd graph
        compiled = trainer.train_step.lower(state, images, *gt, 1e-4).compile()
        mem = compiled.memory_analysis()
        temp_mb = getattr(mem, "temp_size_in_bytes", 0) / 1e6
        state, metrics = compiled(state, images, *gt, 1e-4)
        jax.block_until_ready(metrics["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = compiled(state, images, *gt, 1e-4)
        jax.block_until_ready(metrics["loss"])
        out[name] = {"temp_mb": round(temp_mb, 1),
                     "ips": round(batch * iters / (time.perf_counter() - t0), 2),
                     "loss": float(metrics["loss"])}
    for k in ("full", "blocks"):
        out[f"temp_ratio_{k}"] = round(out[k]["temp_mb"] /
                                       max(out["plain"]["temp_mb"], 1e-9), 3)
        out[f"loss_rel_diff_{k}"] = abs(out[k]["loss"] - out["plain"]["loss"]) \
            / max(abs(out["plain"]["loss"]), 1e-9)
    for k in ("plain", "full", "blocks"):
        del out[k]["loss"]
    return out


def measure_dp_scaling(size=128, iters=5):
    """§2.9 artifact: the SAME jitted DP train step on a 1- vs 8-device
    virtual CPU mesh, plus a TRUE 2-process × 4-device cluster
    (jax.distributed over Gloo — the multi-host pod layout, fdt.dist.multihost),
    plus a 4×2 data×space mesh (spatial partitioning: image H sharded, conv
    halo exchanges inserted by the SPMD partitioner), all in child processes
    (the bench process owns the TPU backend; the mesh checks must be hermetic
    to it, like dryrun_multichip).

    Returns {n1_ms, n8_ms, loss_rel_diff, proc2x4_ms, loss_rel_diff_2proc,
    sp4x2_ms, loss_rel_diff_sp4x2, note}.  Every run uses the same GLOBAL
    batch (8) and data, so the losses must agree to float tolerance — that is
    the correctness half.  The wall-clock ratios are reported but this host
    has ONE physical core under the virtual devices, so they measure
    SPMD/cluster overhead, not parallel speedup."""
    import subprocess

    # same helpers as tests/test_multihost.py — ONE tested configuration of
    # XLA flags, terminate timeouts, shared deadlines and worker cleanup
    from fdt.dist.procutil import child_env, free_port, python_workers

    # one worker program for all legs: "local <n_devices>" times a 1-process
    # n-device mesh; "worker <pid> <n_procs> <port>" joins a Gloo cluster
    prog = f"""
import json, sys, time
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
mode = sys.argv[1]
if mode == "worker":
    pid, nproc, port = int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
    from fdt.dist import multihost
    multihost.initialize(f"127.0.0.1:{{port}}", num_processes=nproc,
                         process_id=pid)
from fdt.dist import (make_mesh, make_mesh_2d, multihost, replicated,
                      train_batch_specs)
from fdt.models.pyramidbox import PyramidBox
from fdt.train import PyramidTrainer, pad_targets

if mode == "local2d":  # 4-way data x 2-way spatial (image H) partitioning
    mesh = make_mesh_2d(4, 2)
else:
    mesh = make_mesh(int(sys.argv[2]) if mode == "local" else 8)
trainer = PyramidTrainer(PyramidBox(), "repo", input_size={size})
state = trainer.init_state(jax.random.PRNGKey(0), abstract=True)
state = jax.device_put(state, replicated(mesh))
rng = np.random.RandomState(0)
images = rng.rand(8, {size}, {size}, 3).astype(np.float32) * 255.0
targets = [np.array([[0.1, 0.1, 0.4, 0.4, 0.0]], np.float32)] * 8
gt = pad_targets(targets, max_gt=4)
if mode == "worker":
    lo, hi = multihost.process_batch_bounds(8)
else:
    lo, hi = 0, 8
specs = train_batch_specs(mesh, 3) if mode == "local2d" else None
batch = multihost.globalize_batch(mesh, tuple(
    a[lo:hi] for a in (images,) + tuple(gt)), specs=specs)
state, m = trainer.train_step(state, *batch, 1e-4)
loss = float(jax.block_until_ready(m["loss"]))
iters = int(sys.argv[-1])
t0 = time.perf_counter()
for _ in range(iters):
    state, m = trainer.train_step(state, *batch, 1e-4)
jax.block_until_ready(m["loss"])
print(json.dumps({{"loss": loss,
                   "ms": (time.perf_counter() - t0) / iters * 1e3}}))
"""
    cwd = os.path.dirname(os.path.abspath(__file__))

    def _parse(stdout):
        return json.loads(stdout.strip().splitlines()[-1])

    def run_local(n, mode="local"):
        r = subprocess.run([sys.executable, "-c", prog, mode, str(n),
                            str(iters)],
                           capture_output=True, text=True, timeout=1500,
                           cwd=cwd, env=child_env(8))
        if r.returncode != 0:
            raise RuntimeError(f"dp_scaling child failed: {r.stderr[-500:]}")
        return _parse(r.stdout)

    def run_2proc():
        # iters=1 on this leg: its wall-clock is stated as overhead-only (two
        # processes time-slice ONE core), while the loss equality is the
        # artifact — no reason to spend 5 minutes stepping for it.
        # Fresh port per attempt; shared 1500s deadline; all-worker cleanup.
        port = free_port()
        results = python_workers(
            [["-c", prog, "worker", str(i), "2", str(port), "1"]
             for i in range(2)],
            timeout=1500, env=child_env(4), cwd=cwd)
        outs = [_parse(out) for _, out, _ in results]
        assert outs[0]["loss"] == outs[1]["loss"]
        return outs[0]

    l1 = run_local(1)
    l8 = run_local(8)
    retryable = (RuntimeError, AssertionError, subprocess.TimeoutExpired)
    try:
        p2 = run_2proc()
    except retryable:
        # one retry — the known nondeterministic XLA:CPU collective
        # rendezvous deadlock (same policy as tests/test_multihost.py;
        # WorkerFailure is a RuntimeError); the terminate timeouts turn a
        # deadlock into a fast failure worth re-running
        p2 = run_2proc()
    try:  # 4×2 data×space mesh: spatial partitioning adds halo collectives
        sp = run_local(8, mode="local2d")
    except retryable:
        sp = run_local(8, mode="local2d")
    rel = lambda a, b: abs(a - b) / max(abs(b), 1e-9)
    return {"n1_ms": round(l1["ms"], 1), "n8_ms": round(l8["ms"], 1),
            "loss_rel_diff": rel(l8["loss"], l1["loss"]),
            "proc2x4_ms": round(p2["ms"], 1),
            "loss_rel_diff_2proc": rel(p2["loss"], l1["loss"]),
            "sp4x2_ms": round(sp["ms"], 1),
            "loss_rel_diff_sp4x2": rel(sp["loss"], l1["loss"]),
            "note": ("virtual devices share 1 physical core; ratios = "
                     "SPMD/cluster overhead, not speedup")}


def measure_tracker(iters=3, frames=64, batch=16, device=False, fused=False):
    """Offline tracking FPS (iouTracke_cal.py protocol, 640×480 frames).

    Offline means the frame axis batches: detection runs on device in
    batch-16 chunks, then the greedy IoU association replays per frame.
    device=False: association fully on host (sequential by construction —
    each frame's matches consume detections).  device=True: the association
    decisions run as one jitted lax.scan per 16-frame chunk
    (fdt.track.device_tracker, bit-parity tested vs the host tracker), the
    host only replays the emitted assignment records.  fused=True: the whole
    chunk pipeline stays on device (fdt.track.fused.FusedVideoTracker) — the
    detection tensor is never read back and the rows are never re-uploaded,
    so the number measures the TPU, not the tunnel RTT.  The reference runs
    detect+associate strictly per frame on GPU."""
    import jax
    import jax.numpy as jnp
    from fdt.infer.pyramidbox import PyramidBoxDetector, detections_to_rows
    from fdt.models.pyramidbox_mobile import build_pyramidbox
    from fdt.track.device_tracker import DeviceIoUTracker
    from fdt.track.iou_tracker import IoUTracker

    model = build_pyramidbox("repo", dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 480, 640, 3)))
    det = PyramidBoxDetector(variables, model, "repo", budget=5000,
                             precision="default")
    frame = _sample_frame(480, 640)
    run = det._compiled(640, 480, 0.4, 0.35)
    staged = jax.device_put(np.broadcast_to(frame, (batch, 480, 640, 3)).copy())
    np.asarray(run(det.variables, staged))  # compile
    if fused:
        from fdt.track.fused import FusedVideoTracker
        # det_cap=32 = the rows[:32] cap of the host/device configs below
        make_tracker = lambda: FusedVideoTracker(det, det_cap=32,
                                                 threshold=0.4, nms_thresh=0.35)
        warm = make_tracker()
        warm.step_frames(staged)   # compile the post graph off the clock
    else:
        make_tracker = DeviceIoUTracker if device else IoUTracker
    if device:  # compile the association chunk outside the timed region
        warm = make_tracker()
        warm.step_chunk([np.zeros((32, 5), np.float32)] * batch)
    t0 = time.perf_counter()
    n = 0
    for _ in range(iters):
        tracker = make_tracker()
        if fused:
            for _c in range(frames // batch):
                tracker.step_frames(staged)
                n += batch
            tracker.flush()
            continue
        for _c in range(frames // batch):
            out = np.asarray(run(det.variables, staged))
            # untrained weights pass the 0.4 floor en masse; cap to a
            # realistic tracking-scene density so the association cost
            # reflects real scenes, not the random-init artifact.  Measured
            # with TRAINED try3 weights on the 12-face crowd scene: 17-18
            # detections/frame at the 0.4 floor
            # (tests/test_trained_weights.py) — the 32 cap is above
            # real-scene density, not below it.
            rows_chunk = [detections_to_rows(out[f], 0.4, [640, 480, 640, 480])[:32]
                          for f in range(batch)]
            if device:
                tracker.step_chunk(rows_chunk)
            else:
                for rows in rows_chunk:
                    tracker.step(rows)
            n += batch
    return n / (time.perf_counter() - t0)


# ---------------- reference CPU baselines ---------------------------------------

def _ref_path():
    sys.path.insert(0, "/root/reference")


def _ref_stubs():
    import types
    import torch
    time.clock = getattr(time, "clock", time.time)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.cuda.memory_cached = lambda *a, **k: 0
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tfm = types.ModuleType("torchvision.transforms")

        class _ToTensor:
            def __call__(self, pic):
                arr = np.asarray(pic).astype(np.float32) / 255.0
                return torch.from_numpy(arr.transpose(2, 0, 1))

        tfm.ToTensor = _ToTensor
        tv.transforms = tfm
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tfm
    return torch


def measure_reference_pyramid(variant="repo", size=640, iters=2):
    torch = _ref_stubs()
    _ref_path()
    try:
        if variant == "repo":
            from pyramid import build_sfd as build
        elif variant == "try1":
            from pyramid_mobile_try1 import build_sfd_mobile as build
        elif variant == "try3":
            from pyramid_mb2_try3 import build_sfd_mobile as build
        else:
            return None
        torch.manual_seed(0)
        net = build("test", 640, 2)
        net.eval()
        if size == 640:
            x = torch.zeros(1, 3, 640, 640)
        else:
            x = torch.zeros(1, 3, size, 640)
        with torch.no_grad():
            net(x)
            t0 = time.perf_counter()
            for _ in range(iters):
                net.firstTime = True
                net(x)
            return iters / (time.perf_counter() - t0)
    finally:
        sys.path.pop(0)


def measure_reference_facebox(iters=3):
    torch = _ref_stubs()
    _ref_path()
    try:
        from FACEBOX.encoderl import DataEncoder
        from FACEBOX.networks import FaceBox
        net = FaceBox()
        if os.path.exists(FACEBOX_PT):
            net.load_state_dict(torch.load(FACEBOX_PT, map_location="cpu",
                                           weights_only=True))
        net.eval()
        enc = DataEncoder()
        im = _sample_frame(1024, 1024).astype(np.float32) / 255.0
        x = torch.from_numpy(im.transpose(2, 0, 1))[None]
        with torch.no_grad():
            loc, conf = net(x)
            t0 = time.perf_counter()
            for _ in range(iters):
                loc, conf = net(x)
                sm = torch.nn.functional.softmax(conf.squeeze(0), dim=1)
                # decode_np expects torch tensors (calls .numpy() itself,
                # encoderl.py:315-319)
                enc.decode_np(loc.detach().squeeze(0), sm.detach())
            return iters / (time.perf_counter() - t0)
    finally:
        sys.path.pop(0)


def measure_reference_mtcnn(iters=5, reps=3):
    """Best-of-reps: this is the noisiest baseline (a full host python
    cascade per frame), so a refresh takes the reference at its FASTEST —
    the conservative direction for our vs_baseline ratios."""
    torch = _ref_stubs()  # noqa: F841
    if not os.path.exists(MTCNN_P):
        return None
    _ref_path()
    try:
        from MTCNN.mtcnn.core.detect import MtcnnDetector, create_mtcnn_net
        pnet, rnet, onet = create_mtcnn_net(
            MTCNN_P, MTCNN_P.replace("pnet", "rnet"),
            MTCNN_P.replace("pnet", "onet"), use_cuda=False)
        det = MtcnnDetector(pnet=pnet, rnet=rnet, onet=onet)
        frame = _sample_frame(480, 640)
        det.detect_face(frame)
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                det.detect_face(frame)
            best = min(best, (time.perf_counter() - t0) / iters)
        return 1.0 / best
    finally:
        sys.path.pop(0)


BASELINE_FNS = {
    "flagship": lambda: measure_reference_pyramid("repo"),
    "facebox": measure_reference_facebox,
    "mtcnn": measure_reference_mtcnn,
    "try1": lambda: measure_reference_pyramid("try1"),
    "try3": lambda: measure_reference_pyramid("try3"),
    "tracker": lambda: measure_reference_pyramid("repo", size=480),
}


def get_baselines(refresh=False):
    cache = {}
    if os.path.exists(CACHE):
        try:
            cache = json.load(open(CACHE))
        except Exception:
            cache = {}
    if "reference_cpu_images_per_sec" in cache:  # round-1 cache layout
        cache.setdefault("flagship", cache.pop("reference_cpu_images_per_sec"))
    changed = False
    for name, fn in BASELINE_FNS.items():
        if refresh or cache.get(name) is None:
            if not os.path.isdir("/root/reference"):
                continue
            try:
                cache[name] = fn()
            except Exception as e:  # pragma: no cover
                print(f"# baseline {name} failed: {e}", file=sys.stderr)
                cache[name] = None
            changed = True
    if changed:
        json.dump(cache, open(CACHE, "w"))
    return cache


def _probe_device(timeout=300):
    """Probe the accelerator from a CHILD process with a hard timeout.

    The tunneled TPU in this environment can wedge entirely (device
    enumeration or the first transfer blocks inside native code, unkillable
    from Python — observed outages of 1h+).  A wedged tunnel must yield a
    fast, explicit bench failure instead of hanging the driver's capture.
    Returns None when healthy, else a one-line reason.  The generous timeout
    covers the plugin's legitimate >60s init idle on a healthy tunnel."""
    import subprocess
    prog = ("import jax, jax.numpy as jnp\n"
            "x = jnp.ones((128, 128))\n"
            "print(jax.devices()[0].platform, float((x @ x).sum()))\n")
    try:
        r = subprocess.run([sys.executable, "-c", prog], timeout=timeout,
                           capture_output=True, text=True,
                           cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired:
        return f"device probe hung >{timeout}s (wedged accelerator tunnel)"
    if r.returncode != 0:
        return f"device probe exited rc={r.returncode}: {r.stderr[-300:]}"
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    # 128 measured best on v5e: 407 img/s MFU 0.61 vs 388/0.58 at 64 —
    # the bigger batch amortizes the decode/NMS tail further
    ap.add_argument("--flagship-batch", type=int, default=128,
                    help="flagship detect batch (64 amortizes the "
                         "decode/NMS tail best on v5e: 388 vs 378 img/s)")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    ap.add_argument("--budget", type=int, default=5000,
                    help="NMS candidate budget (5000 = reference nms_top_k)")
    ap.add_argument("--configs", default="all",
                    help="comma list of flagship,flagship_int8,facebox,mtcnn,"
                         "try1,try3,tracker,tracker_device,tracker_fused,"
                         "try3_trained,"
                         "train,train_bf16,train_remat,dp_scaling")
    ap.add_argument("--measure-baseline", action="store_true")
    ap.add_argument("--no-probe", action="store_true",
                    help="skip the wedged-tunnel device probe")
    args = ap.parse_args()

    if not args.no_probe:
        err = _probe_device()
        if err:
            # one honest JSON line, nonzero exit: the device is unreachable,
            # which is an environment outage, not a framework regression
            print(json.dumps({
                "metric": "pyramidbox_res50_640_detect_images_per_sec_per_chip",
                "value": None, "unit": "images/s", "vs_baseline": None,
                "error": err}))
            sys.exit(1)

    want = (list(BASELINE_FNS) + ["flagship_int8", "tracker_device",
                                  "tracker_fused", "try3_trained",
                                  "dp_scaling"]
            if args.configs == "all"
            else [c.strip() for c in args.configs.split(",")])
    baselines = get_baselines(refresh=args.measure_baseline)

    def ratio(v, name):
        b = baselines.get(name)
        return round(v / b, 2) if (v and b) else None

    results = {}
    mfu = None
    for name in want:
        try:
            if name == "flagship":
                ips, mfu = measure_pyramidbox(args.flagship_batch, args.iters,
                                              args.dtype, args.budget, "repo",
                                              want_mfu=True, record="flagship")
            elif name == "flagship_int8":
                # opt-in post-training int8 path (fdt.ops.quant): int8×int8→
                # int32 on the MXU at 2× the bf16 rate; accuracy drift pinned
                # in tests/test_quant.py.  Compared against the same torch-CPU
                # flagship baseline.
                ips, _ = measure_pyramidbox(args.flagship_batch, args.iters,
                                            args.dtype, args.budget, "repo",
                                            record="flagship_int8",
                                            quant="int8")
            elif name in ("try1", "try3"):
                ips, _ = measure_pyramidbox(args.batch, args.iters, args.dtype,
                                            args.budget, name)
            elif name == "try3_trained":
                # same config as try3 but with the mini-dataset trained
                # weights: the decode/NMS cost runs on a REAL score
                # distribution instead of random-init noise (the random-init
                # caveat from round 2).  Compared against the same torch-CPU
                # try3 baseline (which itself runs seeded random weights —
                # the reference ships no trained try3 checkpoint either).
                if not os.path.exists(TRY3_TRAINED):
                    continue
                ips, _ = measure_pyramidbox(args.batch, args.iters, args.dtype,
                                            args.budget, "try3",
                                            record="try3_trained",
                                            weights=TRY3_TRAINED)
            elif name == "facebox":
                ips = measure_facebox()
            elif name == "mtcnn":
                ips = measure_mtcnn()
            elif name == "tracker":
                ips = measure_tracker()
            elif name == "tracker_device":
                ips = measure_tracker(device=True)
            elif name == "tracker_fused":
                ips = measure_tracker(fused=True)
            elif name in ("train", "train_bf16"):
                ips, train_mfu = measure_train(
                    dtype="bfloat16" if name == "train_bf16" else "float32")
                if train_mfu:
                    _SPREADS[name + "_mfu"] = round(train_mfu, 4)
            elif name == "dp_scaling":
                results[name] = measure_dp_scaling()
                continue
            elif name == "train_remat":
                results[name] = measure_remat()
                continue
            else:
                continue
            results[name] = ips
        except Exception as e:  # pragma: no cover
            print(f"# config {name} failed: {e}", file=sys.stderr)
            results[name] = None

    flagship = results.get("flagship")
    extras = {}
    for name in want:
        if name == "flagship" or (name == "try3_trained"
                                  and name not in results):
            continue
        v = results.get(name)
        if name in ("dp_scaling", "train_remat"):
            extras[name] = v  # dict artifact, not a throughput
            continue
        unit = "frames/s" if name.startswith("tracker") else "images/s"
        if name.startswith("train"):
            unit = "images/s (train step)"
        base_of = {"try3_trained": "try3", "tracker_device": "tracker",
                   "tracker_fused": "tracker", "flagship_int8": "flagship"}
        entry = {"value": round(v, 2) if v else None, "unit": unit,
                 "vs_baseline": ratio(v, base_of.get(name, name))}
        if name in _SPREADS:
            entry["spread_pct"] = _SPREADS[name]
        if name + "_mfu" in _SPREADS:
            entry["mfu"] = _SPREADS[name + "_mfu"]
        extras[name] = entry
    out = {
        "metric": "pyramidbox_res50_640_detect_images_per_sec_per_chip",
        "value": round(flagship, 2) if flagship else None,
        "unit": "images/s",
        "vs_baseline": ratio(flagship, "flagship"),
        "nms_budget": args.budget,
        "batch": args.flagship_batch,
        "mfu": round(mfu, 4) if mfu else None,
        "spread_pct": _SPREADS.get("flagship"),
        "extras": extras,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
