"""MTCNN cascade, fully on device (SURVEY §7.4 redesign).

The reference cascade (MTCNN/mtcnn/core/detect.py:246-620) interleaves host
work with device forwards: a Python image-pyramid while-loop with a cv2.resize
and a PNet round-trip per level, numpy NMS between stages, and a per-candidate
cv2 crop loop feeding RNet/ONet.  On TPU that structure is bandwidth-bound on
the host link, so here the *entire* cascade is one jitted XLA program per image
shape:

  * **Pyramid atlas** — every pyramid level is resized on device with a
    separable constant-tap bilinear gather that reproduces cv2.resize's
    fx-based coordinate mapping exactly (see _cv2_fx_taps) and is packed
    into one tall canvas at even row offsets.  PNet runs fully
    convolutionally ONCE over the atlas; because all PNet convs are VALID,
    cells whose 12×12 window lies inside a level's rectangle are bit-identical
    to a per-level run, and straddling cells are masked out at trace time.
  * **Fixed candidate budgets** — top-K per level → vmapped device NMS
    ('minimum', detect.py:314) → cross-level NMS ('union', detect.py:326) →
    RNet budget → NMS → ONet budget → final NMS ('minimum', detect.py:579),
    all via fdt.geometry.nms.nms_padded fixpoint sweeps.
  * **Gather crops** — the reference's per-candidate square/pad/cv2.resize loop
    (detect.py:396-405) becomes a vmapped bilinear gather that samples the
    zero-extended image at cv2-resize source coordinates; out-of-image taps
    read 0 exactly like the reference's zero-padded `tmp` canvas.

One host→device transfer (the image) and one device→host transfer (the fixed
[out_k] result block) per image.  The host path (fdt.infer.mtcnn) is kept as
the parity oracle; scores differ only by the reference's uint8 quantization
after each cv2.resize (the device path stays in float), which is bounded by
tests/test_mtcnn_device.py on the shipped sample images.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from fdt.config import MTCNN, MTCNNConfig
from fdt.geometry.nms import nms_keep_mask, nms_padded
from fdt.ops.s2d import (conv_valid, pad_cells, phase_s2d_kernel,
                         space_to_depth)
from fdt.models.mtcnn import ONet, PNet, RNet


@dataclasses.dataclass(frozen=True)
class DeviceBudgets:
    """Static candidate-count caps for the fixed-shape cascade.

    The reference carries unbounded candidate lists between stages; these caps
    change results only when a stage would produce more candidates than its
    cap (generous for face scenes).  The cascade emits a `saturated` flag
    whenever any cap MAY have truncated candidates (crowded scenes), so
    truncation is never silent — eval warns and can fall back to the host
    oracle (tests/test_mtcnn_device.py pins both flag polarities)."""
    pnet_cand_k: int = 8192  # above-threshold cells entering per-level PNet NMS
    merge_k: int = 2048      # per-level survivors entering the cross-level NMS
    rnet_k: int = 2048       # crops entering RNet (≥ merge_k: the reference
                             # feeds every PNet survivor to RNet, detect.py:352)
    onet_k: int = 512        # crops entering ONet
    out_k: int = 256         # final detections returned


#: Budgets auto-sized to TYPICAL scenes (the shipped sample corpus peaks at a
#: few hundred PNet candidates).  The NMS fixpoints and top-k sweeps cost
#: O(budget²)/O(budget·log) regardless of the live count, so sweeping 512/128
#: instead of 2048/512 cuts the cascade's fixed overhead; pass as
#: ``fast_budgets=`` and the cascade falls back to the full budgets whenever
#: the saturation flag trips — keep-set-identical by construction when
#: unsaturated (sat=False ⇒ no cap truncated ⇒ both tiers equal the
#: reference's unbounded lists).  out_k matches DeviceBudgets so the two
#: tiers return same-shape blocks.
FAST_BUDGETS = DeviceBudgets(pnet_cand_k=2048, merge_k=512, rnet_k=512,
                             onet_k=128, out_k=256)

#: Middle tier: holds typical 640×480 VIDEO frames, which overflow FAST —
#: the bench frame peaks at ~3.0k above-threshold PNet cells and 682
#: cross-level merge survivors (past FAST's 2048/512, well inside
#: 4096/1024).  Pass ``fast_budgets=(FAST_BUDGETS, MID_BUDGETS)`` for the
#: full ladder: fast → mid → full, each keep-set-identical when unsaturated.
MID_BUDGETS = DeviceBudgets(pnet_cand_k=4096, merge_k=1024, rnet_k=1024,
                            onet_k=128, out_k=256)


@dataclasses.dataclass(frozen=True)
class PyramidPlan:
    """Static per-(h,w) pyramid layout + PNet cell→box constants."""
    h: int
    w: int
    levels: tuple  # ((lh, lw, y_off, scale), ...)
    atlas_h: int
    atlas_w: int
    map_h: int
    map_w: int
    cell_boxes: np.ndarray   # [map_h*map_w, 4] f32 (x1,y1,x2,y2 in image coords)
    cell_level: np.ndarray   # [map_h*map_w] int32, -1 for invalid cells


def _pnet_map_size(n: int) -> int:
    """PNet output extent for input extent n (conv3→pool2/2→conv3→conv3, VALID)."""
    return max((n - 2) // 2 - 4, 0)


def _scale_ladder(h: int, w: int, min_face_size: float, scale_factor: float):
    """The reference's pyramid ladder for an (h, w) image: [(lh, lw, s), ...]
    with lh/lw = rint(extent·s) (cv2.resize fx semantics) — the
    detect.py:277-284 while-loop.  Single source of truth for build_plan's
    level set and the bucketed mode's native-level count."""
    net_size = 12
    s = net_size / min_face_size
    out = []
    lh, lw = int(np.rint(h * s)), int(np.rint(w * s))
    while min(lh, lw) > net_size:
        out.append((lh, lw, s))
        s *= scale_factor
        lh, lw = int(np.rint(h * s)), int(np.rint(w * s))
    return out


def n_pyramid_levels(h: int, w: int,
                     min_face_size: float = MTCNN.min_face_size,
                     scale_factor: float = MTCNN.scale_factor) -> int:
    """Length of the reference's pyramid ladder for an (h, w) image."""
    return len(_scale_ladder(h, w, min_face_size, scale_factor))


@functools.lru_cache(maxsize=256)
def build_plan(h: int, w: int, min_face_size: float = MTCNN.min_face_size,
               scale_factor: float = MTCNN.scale_factor,
               cell_size: int = MTCNN.cell_size,
               stride: int = MTCNN.stride,
               max_levels: int | None = None) -> PyramidPlan:
    """Scale ladder + atlas layout + cell→box maps for one image shape.

    Level sizes replicate cv2.resize(im, None, fx=s, fy=s): rint(extent·s)
    (detect.py:277-284).  Levels stack vertically at even row offsets so the
    PNet stride-2 pooling grid stays aligned with each level's own grid.
    max_levels truncates the ladder (bucketed mode: a padded canvas would
    otherwise grow extra coarse levels the native image never runs).
    """
    ladder = _scale_ladder(h, w, min_face_size, scale_factor)
    if max_levels is not None:
        ladder = ladder[:max_levels]
    levels = []
    y = 0
    for lh, lw, s in ladder:
        levels.append((lh, lw, y, s))
        y += lh + (lh % 2)  # keep offsets even
    if not levels:
        raise ValueError(f"image {h}x{w} smaller than the 12px net")
    atlas_h, atlas_w = y, max(lw_ for _, lw_, _, _ in levels)
    map_h, map_w = _pnet_map_size(atlas_h), _pnet_map_size(atlas_w)

    boxes = np.zeros((map_h, map_w, 4), np.float32)
    level_id = np.full((map_h, map_w), -1, np.int32)
    for li, (lh_, lw_, y_off, sc) in enumerate(levels):
        if min(lh_, lw_) < cell_size:
            continue
        i0 = y_off // 2
        vh = (lh_ - cell_size) // stride + 1
        vw = (lw_ - cell_size) // stride + 1
        ii = np.arange(vh)
        jj = np.arange(vw)
        # generate_bounding_box (detect.py:134-181): round(stride·cell / scale)
        x1 = np.round((stride * jj) / sc)
        y1 = np.round((stride * ii) / sc)
        x2 = np.round((stride * jj + cell_size) / sc)
        y2 = np.round((stride * ii + cell_size) / sc)
        sl = (slice(i0, i0 + vh), slice(0, vw))
        boxes[sl + (0,)] = x1[None, :]
        boxes[sl + (1,)] = y1[:, None]
        boxes[sl + (2,)] = x2[None, :]
        boxes[sl + (3,)] = y2[:, None]
        level_id[sl] = li
    return PyramidPlan(h, w, tuple(levels), atlas_h, atlas_w, map_h, map_w,
                       boxes.reshape(-1, 4), level_id.reshape(-1))


def _cv2_fx_taps(src: int, dst: int, fx: float):
    """Bilinear taps/weights for cv2.resize(im, None, fx=fx) along one axis.

    cv2 maps dst pixel u → src coord (u+0.5)/fx − 0.5 (the INVERSE of the
    requested factor, NOT the src/dst size ratio — dst = rint(src·fx) makes
    those differ, which is why jax.image.resize can't reproduce it), and at
    the borders clamps the tap with weight forced to 0."""
    g = (np.arange(dst) + 0.5) / fx - 0.5
    i0 = np.floor(g).astype(np.int32)
    f = (g - i0).astype(np.float32)
    f = np.where(i0 < 0, 0.0, f)
    i0 = np.maximum(i0, 0)
    f = np.where(i0 >= src - 1, 0.0, f).astype(np.float32)
    i0 = np.minimum(i0, src - 1).astype(np.int32)
    i1 = np.minimum(i0 + 1, src - 1).astype(np.int32)
    return i0, i1, f


def _interp_matrix(i0, i1, f, n_src: int) -> np.ndarray:
    """[dst] taps/weights → dense [dst, n_src] interpolation matrix (trace-time
    constant).  += handles the clamped i0==i1 border case (weight sums to 1)."""
    W = np.zeros((len(i0), n_src), np.float32)
    W[np.arange(len(i0)), i0] += 1.0 - f
    W[np.arange(len(i1)), i1] += f
    return W


def _resize_level(img255, src_h: int, src_w: int, lh: int, lw: int, fx: float):
    """cv2.resize(uint8 im, None, fx=fx) on device as two constant-matrix
    contractions (separable bilinear = Ry @ img @ Rxᵀ — rides the MXU instead
    of latency-bound gathers), then rounding to integers like the uint8 output
    the reference feeds PNet (detect.py:278-284)."""
    ry = jnp.asarray(_interp_matrix(*_cv2_fx_taps(src_h, lh, fx), src_h))
    rx = jnp.asarray(_interp_matrix(*_cv2_fx_taps(src_w, lw, fx), src_w))
    rows = jnp.einsum("yh,hwc->ywc", ry, img255, precision="highest")
    lvl = jnp.einsum("xw,ywc->yxc", rx, rows, precision="highest")
    return jnp.round(lvl)


def _pnet_s2d(params, atlas, precision):
    """PNet forward in space-to-depth form → (cls [H',W'], reg [H',W',4]).

    The standard NHWC PNet runs 3/10/16-channel convs over a megapixel atlas —
    ~1% MXU utilization on TPU (channel dims pad to 128 lanes).  Packing
    stride-4 phases into channels turns the stack into K=192/160/256 matmuls:
    conv1 becomes a 2×2×48→160 conv at quarter resolution with the 2×2 maxpool
    fused as a max over phase sub-blocks, conv2/conv3 stay phase-packed, and
    the 1×1 heads apply per phase.  Measured 3.5× over the direct conv path on
    v5e at identical (≤2e-6) numerics; see tests/test_mtcnn_device.py."""
    p = params["params"] if "params" in params else params
    k1, b1 = p["pre_layer__0"]["kernel"], p["pre_layer__0"]["bias"]
    s1 = p["pre_layer__1"]["negative_slope"]
    k2, b2 = p["pre_layer__3"]["kernel"], p["pre_layer__3"]["bias"]
    s2 = p["pre_layer__4"]["negative_slope"]
    k3, b3 = p["pre_layer__5"]["kernel"], p["pre_layer__5"]["bias"]
    s3 = p["pre_layer__6"]["negative_slope"]

    def prelu(x, s):
        return jnp.where(x >= 0, x, s * x)

    map_h = _pnet_map_size(atlas.shape[0])
    map_w = _pnet_map_size(atlas.shape[1])
    x = space_to_depth(pad_cells(atlas, 4), 4)                      # [H/4, W/4, 48]
    y = prelu(conv_valid(x, phase_s2d_kernel(k1, 4), precision)
              + jnp.tile(b1, 16), s1)                      # 16 phases × 10
    ph, pw, _ = y.shape
    # fused MaxPool2d(2,2): phase (a,b) pairs (2a₂+i, 2b₂+j) form one window
    y = y.reshape(ph, pw, 2, 2, 2, 2, 10).max(axis=(3, 5))
    y = y.reshape(ph, pw, 40)                              # = s2d of pool out
    y = prelu(conv_valid(y, phase_s2d_kernel(k2, 2), precision)
              + jnp.tile(b2, 4), s2)                       # 4 phases × 16
    y = prelu(conv_valid(y, phase_s2d_kernel(k3, 2), precision)
              + jnp.tile(b3, 4), s3)                       # 4 phases × 32
    p3, q3, _ = y.shape
    y = y.reshape(p3, q3, 4, 32)
    heads = jnp.concatenate([p["conv4_1"]["kernel"][0, 0],
                             p["conv4_2"]["kernel"][0, 0]], axis=1)  # [32, 5]
    bias = jnp.concatenate([p["conv4_1"]["bias"], p["conv4_2"]["bias"]])
    out = jnp.einsum("pqac,cd->pqad", y, heads,
                     precision=precision) + bias           # [P,Q,4,5]
    out = (out.reshape(p3, q3, 2, 2, 5).transpose(0, 2, 1, 3, 4)
           .reshape(2 * p3, 2 * q3, 5)[:map_h, :map_w])
    return jax.nn.sigmoid(out[..., 0]), out[..., 1:]


def _apply_regression(boxes, reg, scores):
    """detect.py:336-348 / 445-452: offsets scaled by inclusive box extent."""
    bw = boxes[:, 2] - boxes[:, 0] + 1.0
    bh = boxes[:, 3] - boxes[:, 1] + 1.0
    return jnp.stack([boxes[:, 0] + reg[:, 0] * bw,
                      boxes[:, 1] + reg[:, 1] * bh,
                      boxes[:, 2] + reg[:, 2] * bw,
                      boxes[:, 3] + reg[:, 3] * bh,
                      scores], axis=1)


def _square_round_clamp(boxes, eh, ew):
    """square_bbox + round + pad clamp (detect.py:102-131, 183-244, 414-415).

    Returns (clamped [K,4] — what flows onward, exactly like the reference's
    in-place clamp), plus the UNclamped rounded origin/extent the crop sampler
    needs (the zero-padded `tmp` canvas geometry).  eh/ew are the IMAGE extent
    — traced scalars, so the bucketed path clamps to the native image rather
    than its padded canvas (reference clamps to the real image, detect.py:
    414-415) without a per-native-size recompile."""
    bw = boxes[:, 2] - boxes[:, 0] + 1.0
    bh = boxes[:, 3] - boxes[:, 1] + 1.0
    la = jnp.maximum(bw, bh)
    x1f = boxes[:, 0] + bw * 0.5 - la * 0.5
    y1f = boxes[:, 1] + bh * 0.5 - la * 0.5
    x1 = jnp.round(x1f)
    y1 = jnp.round(y1f)
    x2 = jnp.round(x1f + la - 1.0)
    y2 = jnp.round(y1f + la - 1.0)
    tmpw = x2 - x1 + 1.0
    tmph = y2 - y1 + 1.0
    clamped = jnp.stack([jnp.maximum(x1, 0.0), jnp.maximum(y1, 0.0),
                         jnp.minimum(x2, ew - 1.0),
                         jnp.minimum(y2, eh - 1.0)], axis=1)
    return clamped, x1, y1, tmpw, tmph


def _crop_resize(image, h: int, w: int, x1, y1, tmpw, tmph, out_size: int,
                 eh=None, ew=None):
    """Bilinear gather replicating zero-pad-crop + cv2.resize (detect.py:396-405).

    cv2.resize samples src coord (u+0.5)·(src/dst) − 0.5 clamped to the source
    canvas; the source canvas here is the zero-extended image window starting
    at (x1, y1) with extent (tmpw, tmph).  h/w are the ARRAY dims (static);
    eh/ew the image extent (traced scalars) — taps past the true image read
    zero even when the array carries a padded canvas (bucketed mode)."""
    eh = float(h) if eh is None else eh
    ew = float(w) if ew is None else ew
    u = jnp.arange(out_size, dtype=jnp.float32) + 0.5
    sx = jnp.clip(u * (tmpw / out_size) - 0.5, 0.0, jnp.maximum(tmpw - 1.0, 0.0))
    sy = jnp.clip(u * (tmph / out_size) - 0.5, 0.0, jnp.maximum(tmph - 1.0, 0.0))
    gx = x1 + sx
    gy = y1 + sy
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    fx = (gx - x0)[None, :, None]
    fy = (gy - y0)[:, None, None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    def fetch(yi, xi):
        iny = (yi >= 0) & (yi.astype(jnp.float32) < eh)
        inx = (xi >= 0) & (xi.astype(jnp.float32) < ew)
        px = image[jnp.clip(yi, 0, h - 1)[:, None], jnp.clip(xi, 0, w - 1)[None, :]]
        return px * (iny[:, None] & inx[None, :])[..., None]

    top = fetch(y0, x0) * (1 - fx) + fetch(y0, x0 + 1) * fx
    bot = fetch(y0 + 1, x0) * (1 - fx) + fetch(y0 + 1, x0 + 1) * fx
    return top * (1 - fy) + bot * fy


def _crop_axis_weights(orig, tmp, n_src: int, out_size: int):
    """In-graph [K, out_size, n_src] interpolation weights for one axis of the
    zero-extended-window crop (same sampling rule as _crop_resize): taps
    outside the image get weight 0, replicating the reference's zero-padded
    `tmp` canvas."""
    u = jnp.arange(out_size, dtype=jnp.float32) + 0.5
    g = jnp.clip(u[None, :] * (tmp[:, None] / out_size) - 0.5,
                 0.0, jnp.maximum(tmp - 1.0, 0.0)[:, None])        # [K, S]
    i0 = jnp.floor(g)
    f = g - i0
    a0 = orig[:, None] + i0                                        # image coords
    r = jnp.arange(n_src, dtype=jnp.float32)
    return ((r == a0[..., None]) * (1.0 - f)[..., None]
            + (r == (a0 + 1.0)[..., None]) * f[..., None])         # [K, S, n_src]


def _chunked_crop_forward(img255, h: int, w: int, x1, y1, tmpw, tmph,
                          out_size: int, impl: str, apply_fn, out_dims,
                          active_k, chunk: int = 256, eh=None, ew=None):
    """Fused crop + net forward over [K] candidates, chunked, stopping at the
    live count.

    impl="matmul": separable interpolation as two MXU contractions (~30×
    faster than the gather form on TPU, where per-candidate gathers are
    latency-bound); impl="gather": the 4-tap form (faster on CPU backends).

    The cascade's static budgets (rnet_k=2048 / onet_k=512) make the crop
    einsums and the RNet/ONet forwards sweep the full budget even when a scene
    produced a handful of survivors — the dominant cascade cost after PNet
    (profile: RNet stage 47ms, ONet 30ms of a 116ms batch-8 step at 480×640).
    Candidates are score-sorted with all live rows first, so a while_loop over
    `chunk`-sized blocks that stops once ``c*chunk >= active_k`` computes every
    live candidate exactly (bit-identical crops and net outputs to the full
    sweep) and skips only blocks that downstream masking (-inf scores past the
    live count) ignores entirely.  Cost now tracks live candidates, matching
    the reference's unbounded per-survivor lists (detect.py:352-405) instead of
    the worst-case cap.  Under vmap (detect_batch) the loop runs to the batch
    max — per-batch cost is the largest live count, same semantics.

    apply_fn: [chunk, S, S, 3] crops → tuple of [chunk, d] outputs (d from
    out_dims).  Returns full-[K] buffers (zeros past the live count).
    """
    k = x1.shape[0]
    chunk = min(chunk, k)
    if k % chunk != 0:
        chunk = k  # odd custom budgets: one full block (correctness first)
    bufs = tuple(jnp.zeros((k, d), jnp.float32) for d in out_dims)

    def body(carry):
        c, bufs = carry
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, c * chunk, chunk)
        cx1, cy1, ctw, cth = sl(x1), sl(y1), sl(tmpw), sl(tmph)
        if impl == "gather":
            crops = jax.vmap(lambda a, b, cc, d: _crop_resize(
                img255, h, w, a, b, cc, d, out_size, eh, ew))(cx1, cy1, ctw, cth)
        else:
            wy = _crop_axis_weights(cy1, cth, h, out_size)         # [c, S, H]
            wx = _crop_axis_weights(cx1, ctw, w, out_size)         # [c, S, W]
            if eh is not None:  # bucketed canvas: zero taps past the image
                wy = wy * (jnp.arange(h, dtype=jnp.float32) < eh)
                wx = wx * (jnp.arange(w, dtype=jnp.float32) < ew)
            rows = jnp.einsum("kyh,hwc->kywc", wy, img255, precision="highest")
            crops = jnp.einsum("kxw,kywc->kyxc", wx, rows, precision="highest")
        # round like the reference's uint8 crop canvas, then /255 (ToTensor)
        outs = apply_fn(jnp.round(crops) / 255.0)
        bufs = tuple(jax.lax.dynamic_update_slice_in_dim(b, o, c * chunk, 0)
                     for b, o in zip(bufs, outs))
        return c + 1, bufs

    def cond(carry):
        c, _ = carry
        return c * chunk < active_k

    _, bufs = jax.lax.while_loop(cond, body, (jnp.int32(0), bufs))
    return bufs


class MTCNNDeviceCascade:
    """Single-jit MTCNN cascade. One compile per image (h, w); fixed-size
    streams (video/webcam/tracking, bucketed eval) compile once and stay on
    device.  detect_face() API matches fdt.infer.mtcnn.MTCNNDetector."""

    def __init__(self, pnet_vars, rnet_vars, onet_vars,
                 cfg: MTCNNConfig = MTCNN, budgets: DeviceBudgets = DeviceBudgets(),
                 precision: str = "highest", crop_impl: str | None = None,
                 pnet_impl: str | None = None,
                 fast_budgets: DeviceBudgets | None = None):
        self.cfg = cfg
        self.budgets = budgets
        # Tiered budgets: when fast_budgets is set (one DeviceBudgets or a
        # ladder of them, cheapest first), detect_* runs the cheapest tier
        # first and escalates to the next tier — ultimately the full
        # `budgets` — only when the run's saturation flag trips.  sat=False
        # means no cap truncated a candidate list, so every unsaturated tier
        # equals the reference's unbounded cascade — escalation changes
        # results ONLY where the cheaper tier would have deviated
        # (tests/test_mtcnn_device.py pins equality on both polarities).
        # Typical scenes then pay the small fixed sweeps instead of the
        # worst-case ones.  Escalation is STICKY per compiled shape: once a
        # tier saturates for a shape, later calls on that shape start at the
        # next tier (output-invariant — a tier that would have been
        # unsaturated returns exactly what the higher tiers return — it only
        # skips re-running a sweep that keeps overflowing on this stream).
        if fast_budgets is None:
            self.tier_budgets: tuple = ()
        elif isinstance(fast_budgets, DeviceBudgets):
            self.tier_budgets = (fast_budgets,)
        else:
            self.tier_budgets = tuple(fast_budgets)
        self.fast_budgets = (self.tier_budgets[0] if self.tier_budgets
                             else None)
        self.tier_names = tuple("fast" if i == 0 else f"fast{i}"
                                for i in range(len(self.tier_budgets)))
        # shape key → ladder index to start at.  LRU-bounded like _jitted
        # below (one cache-bounding policy): a native-resolution eval sweep
        # adds one entry per distinct image shape, and although each is a
        # tiny tuple, unbounded retention is inconsistent with the detector's
        # stated bounded-cache policy.  Eviction only forgets stickiness —
        # the evicted shape re-runs its fast tier once (output-invariant).
        from collections import OrderedDict
        self._start_tier: "OrderedDict" = OrderedDict()
        self._start_tier_max = 256
        self.precision = precision
        # matmul crops / space-to-depth PNet ride the MXU; gathers and direct
        # small-channel convs win on CPU backends.  A pinned default device
        # wins over the default backend (test envs pin CPU while a TPU plugin
        # is present).
        from fdt.utils.devices import default_platform
        platform = default_platform()
        self.crop_impl = crop_impl or ("matmul" if platform == "tpu" else "gather")
        self.pnet_impl = pnet_impl or ("s2d" if platform == "tpu" else "direct")
        self.pnet, self.rnet, self.onet = PNet(), RNet(), ONet()
        # stage params on device ONCE — host-numpy checkpoint trees would
        # otherwise re-upload over the host link on every jitted call
        self.vars = jax.device_put({"pnet": pnet_vars, "rnet": rnet_vars,
                                    "onet": onet_vars})
        # bounded LRU (same hazard as PyramidBoxDetector._jitted): a
        # native-resolution eval sweep compiles one cascade per distinct
        # (h, w) — unbounded retention grows process memory for the life of
        # the detector.  Bucketed/fixed-size streams use a handful of keys
        # and never evict.
        from collections import OrderedDict
        self._jitted: "OrderedDict" = OrderedDict()
        self._jitted_max = 64
        self.last_saturated = False  # updated by every detect_* call

    # ----- cascade body (traced once per plan) --------------------------------
    def _cascade(self, plan: PyramidPlan, variables, image, extent=None,
                 stage: str = "onet", budgets: DeviceBudgets | None = None):
        """extent: optional traced pair ([2] native (h, w), [L, 2] native
        pyramid-level (lh, lw)) of the TRUE image inside a padded canvas
        (bucketed mode).  Crop taps and box clamps then honor the native
        extent — zero past the seam, clamp to the real image — and each
        atlas level is zeroed past its native extent, so one compiled
        cascade serves every native size.  None (native/batch paths): the
        array dims ARE the image."""
        cfg = self.cfg
        bud = self.budgets if budgets is None else budgets
        h, w = plan.h, plan.w
        if extent is None:
            eh, ew = float(h), float(w)
            mask_eh = mask_ew = None    # crop taps bounded by the array dims
            level_hw = None
        else:
            eh, ew = extent[0][0], extent[0][1]
            level_hw = extent[1]
            mask_eh, mask_ew = eh, ew
        img255 = image.astype(jnp.float32)  # integer-valued, like the uint8 source

        # 1. pyramid atlas (cv2-exact level resizes, quantized like uint8)
        atlas = jnp.zeros((plan.atlas_h, plan.atlas_w, 3), jnp.float32)
        for li, (lh, lw, y_off, s) in enumerate(plan.levels):
            lvl = _resize_level(img255, h, w, lh, lw, s)
            if level_hw is not None:
                # zero each level past the NATIVE level extent (host-computed
                # with the exact cv2 rint ladder, passed in as traced values):
                # cells whose 12×12 window lies inside the native level are
                # untouched, while seam-straddling windows see pure black —
                # the replicated canvas row/column feeds the resize taps but
                # never reaches PNet
                rm = jnp.arange(lh, dtype=jnp.float32) < level_hw[li, 0]
                cm = jnp.arange(lw, dtype=jnp.float32) < level_hw[li, 1]
                lvl = lvl * (rm[:, None] & cm[None, :])[..., None]
            atlas = jax.lax.dynamic_update_slice(atlas, lvl, (y_off, 0, 0))

        # 2. one PNet forward over the atlas
        if self.pnet_impl == "s2d":
            cls_map, reg_map = _pnet_s2d(variables["pnet"], atlas / 255.0,
                                         self.precision)
            scores = cls_map.reshape(-1)
            regs = reg_map.reshape(-1, 4)
        else:
            with jax.default_matmul_precision(self.precision):
                cls_map, reg_map = self.pnet.apply(variables["pnet"],
                                                   atlas[None] / 255.0)
            scores = cls_map[0, :, :, 0].reshape(-1)
            regs = reg_map[0].reshape(-1, 4)
        cell_boxes = jnp.asarray(plan.cell_boxes)
        cell_level = jnp.asarray(plan.cell_level)
        scores = jnp.where((cell_level >= 0) & (scores > cfg.thresholds[0]),
                           scores, -jnp.inf)

        # 3. per-level NMS ('minimum' 0.4, detect.py:314): top-K over ALL levels'
        # above-threshold cells, suppression segmented by level id — every
        # level's independent greedy NMS solved in one fixpoint
        k = min(bud.pnet_cand_k, scores.shape[0])
        # saturation: a cap may have dropped candidates the reference would
        # have carried (it feeds unbounded lists between stages, detect.py:352)
        sat = jnp.sum(scores > -jnp.inf) > k
        top_s, top_i = jax.lax.top_k(scores, k)
        top_b = cell_boxes[top_i]
        top_r = regs[top_i]
        top_lvl = cell_level[top_i]
        keep = nms_keep_mask(top_b, top_s > -jnp.inf, cfg.pnet_nms_per_level,
                             mode="minimum", seg_id=top_lvl, impl="auto")

        # 4. cross-level merge NMS ('union' 0.6, detect.py:326) + regression
        flat_s = jnp.where(keep, top_s, -jnp.inf)
        sat |= jnp.sum(flat_s > -jnp.inf) > bud.merge_k   # merge-NMS budget
        kidx, kcnt = nms_padded(top_b, flat_s, cfg.pnet_nms_merge,
                                budget=bud.merge_k, out_k=bud.merge_k, mode="union")
        sat |= kcnt == bud.merge_k                        # output block full
        m_valid = jnp.arange(bud.merge_k) < kcnt
        m_scores = jnp.where(m_valid, flat_s[kidx], -jnp.inf)
        p_align = _apply_regression(top_b[kidx], top_r[kidx], m_scores)
        if stage == "pnet":
            return p_align, p_align[:, :4], kcnt, sat

        # 5. RNet (detect.py:352-465)
        r_in = min(bud.rnet_k, bud.merge_k)
        sat |= kcnt > r_in                                # RNet top-k truncated
        r_scores, r_sel = jax.lax.top_k(m_scores, r_in)
        r_boxes = p_align[r_sel]
        r_clamped, rx1, ry1, rtw, rth = _square_round_clamp(r_boxes, eh, ew)

        def rnet_apply(crops):
            with jax.default_matmul_precision(self.precision):
                return self.rnet.apply(variables["rnet"], crops)

        # top_k put the kcnt live candidates first (-inf sorts last), so the
        # fused loop computes exactly them and skips masked budget rows
        r_cls, r_reg = _chunked_crop_forward(
            img255, h, w, rx1, ry1, rtw, rth, 24, self.crop_impl,
            rnet_apply, (1, 4), jnp.minimum(kcnt, r_in),
            eh=mask_eh, ew=mask_ew)
        r_cls = r_cls[:, 0]
        # the reference's RNet NMS orders by the PNet score still in column 4
        # (utils.nms over dets, detect.py:431); the RNet score replaces the
        # column only afterwards (keep_boxes[:,4]=keep_cls, detect.py:441)
        r_nms_s = jnp.where((r_scores > -jnp.inf) & (r_cls > cfg.thresholds[1]),
                            r_scores, -jnp.inf)
        kidx, kcnt = nms_padded(r_clamped, r_nms_s, cfg.rnet_nms,
                                budget=r_in, out_k=bud.onet_k, mode="union")
        sat |= kcnt == bud.onet_k                         # ONet block full
        o_valid = jnp.arange(bud.onet_k) < kcnt
        o_s = jnp.where(o_valid, r_cls[kidx], -jnp.inf)
        r_align = _apply_regression(r_clamped[kidx], r_reg[kidx], o_s)
        if stage == "rnet":
            return r_align, r_align[:, :4], kcnt, sat

        # 6. ONet (detect.py:467-583)
        o_clamped, ox1, oy1, otw, oth = _square_round_clamp(r_align, eh, ew)

        def onet_apply(crops):
            with jax.default_matmul_precision(self.precision):
                return self.onet.apply(variables["onet"], crops)

        o_cls, o_reg, o_lm = _chunked_crop_forward(
            img255, h, w, ox1, oy1, otw, oth, 48, self.crop_impl,
            onet_apply, (1, 4, 10), kcnt, chunk=128,
            eh=mask_eh, ew=mask_ew)
        o_cls = o_cls[:, 0]
        f_s = jnp.where((o_s > -jnp.inf) & (o_cls > cfg.thresholds[2]),
                        o_cls, -jnp.inf)
        o_align = _apply_regression(o_clamped, o_reg, f_s)
        bw = o_clamped[:, 2] - o_clamped[:, 0] + 1.0
        bh = o_clamped[:, 3] - o_clamped[:, 1] + 1.0
        lm = jnp.concatenate([
            (o_clamped[:, 0:1] + o_lm[:, 0::2] * bw[:, None])[:, :, None],
            (o_clamped[:, 1:2] + o_lm[:, 1::2] * bh[:, None])[:, :, None],
        ], axis=2).reshape(-1, 10)

        kidx, kcnt = nms_padded(o_align[:, :4], f_s, cfg.onet_nms,
                                budget=bud.onet_k, out_k=bud.out_k, mode="minimum")
        sat |= kcnt == bud.out_k                          # final block full
        return o_align[kidx], lm[kidx], kcnt, sat

    # ----- host API ------------------------------------------------------------
    def _compiled(self, h: int, w: int, stage: str = "onet",
                  max_levels: int | None = None, with_extent: bool = False,
                  tier: str = "full"):
        key = (h, w, stage, max_levels, with_extent, tier)
        if key not in self._jitted:
            plan = build_plan(h, w, self.cfg.min_face_size,
                              self.cfg.scale_factor, self.cfg.cell_size,
                              self.cfg.stride, max_levels)
            budgets = self._budgets_for(tier)
            if with_extent:  # bucketed: (variables, image, extent pytree)
                fn = functools.partial(self._cascade, plan, stage=stage,
                                       budgets=budgets)
            else:            # native: extent pinned to the array dims
                fn = functools.partial(self._cascade, plan, extent=None,
                                       stage=stage, budgets=budgets)
            self._jitted[key] = jax.jit(fn)
            if len(self._jitted) > self._jitted_max:
                self._jitted.popitem(last=False)
        else:
            self._jitted.move_to_end(key)
        return self._jitted[key]

    def detect_stage(self, img: np.ndarray, stage: str):
        """Run the cascade up to `stage` ('pnet'|'rnet'|'onet') → aligned boxes
        [N,5]; parity/debug hook mirroring the reference's per-stage returns."""
        h, w = img.shape[:2]
        boxes, _, count, sat = self._compiled(h, w, stage)(self.vars,
                                                           jnp.asarray(img))
        self.last_saturated = bool(sat)
        return np.asarray(boxes)[: int(count)]

    def _budgets_for(self, tier: str) -> DeviceBudgets | None:
        """Budgets for a tier name: 'full' → None (self.budgets), 'fast' →
        ladder[0], 'fast<i>' → ladder[i]."""
        if tier == "full":
            return None
        return self.tier_budgets[0 if tier == "fast" else int(tier[4:])]

    def _run_tiered(self, make_fn, *args, shape_key=None):
        """Ladder run with per-tier escalation on saturation (no-op when
        fast_budgets is unset).  make_fn(tier) → the jitted cascade; the
        result's [3] element is the saturation flag (scalar or [B]).
        shape_key: sticky-escalation key — a tier that saturates for this
        key is skipped on subsequent calls (output-invariant, see __init__)."""
        start = self._start_tier.get(shape_key, 0)
        if shape_key in self._start_tier:
            self._start_tier.move_to_end(shape_key)
        for i in range(start, len(self.tier_names)):
            out = make_fn(self.tier_names[i])(self.vars, *args)
            if not bool(np.asarray(out[3]).any()):
                return out
            if shape_key is not None:
                self._start_tier[shape_key] = i + 1
                self._start_tier.move_to_end(shape_key)
                if len(self._start_tier) > self._start_tier_max:
                    self._start_tier.popitem(last=False)
        return make_fn("full")(self.vars, *args)

    def detect_face(self, img: np.ndarray):
        """Full cascade → (boxes [N,5], landmarks [N,10]); same contract as the
        host-path MTCNNDetector.detect_face (detect.py:585-620).

        After each call, `self.last_saturated` reports whether any fixed
        candidate budget MAY have truncated candidates on this image (the
        reference carries unbounded lists, detect.py:352) — crowded scenes
        should warn or fall back to the host oracle.  With `fast_budgets`
        set, a fast-tier saturation silently falls back to the full budgets
        first; the flag then reports the FULL tier's verdict."""
        h, w = img.shape[:2]
        boxes, lm, count, sat = self._run_tiered(
            lambda tier: self._compiled(h, w, tier=tier), jnp.asarray(img),
            shape_key=(h, w))
        self.last_saturated = bool(sat)
        n = int(count)
        if n == 0:
            return np.array([]), np.array([])
        return np.asarray(boxes)[:n], np.asarray(lm)[:n]

    def detect_face_bucketed(self, img: np.ndarray, multiple: int = 128):
        """Variable-resolution detect without a per-(h,w) compile.

        Zero-pads the image right/bottom into a canvas whose dims round up to
        `multiple`, so arbitrary eval-set resolutions share a small set of
        compiled cascades — one per (canvas, ladder-length) pair, the ladder
        truncated to the NATIVE image's level count (a padded canvas would
        otherwise add coarse pyramid levels the reference never runs on this
        image).  Near-exact vs the native path, by construction:

        * the last native row/column is replicated one pixel into the canvas
          so the resize taps of native-content output pixels see the image
          (a downscale tap reaches at most ONE source pixel past the seam:
          g = (u+0.5)/fx − 0.5 ≤ w − 0.5 for u < rint(w·fx), so i1 ≤ w, and
          replicate makes (1−f)·img[w−1] + f·img[w] collapse to img[w−1],
          cv2's clamped border tap);
        * every atlas level is zeroed past its NATIVE level extent (exact
          host-computed ladder, traced in), so seam-straddling PNet windows
          see pure black — the replicated band never reaches PNet;
        * RNet/ONet crop taps and box clamps honor the native extent — taps
          past the true image read zero (the reference's zero crop canvas,
          detect.py:396-405) and boxes clamp to the real image;

        all with no per-native-size recompile.  Residual drift channels:
        (a) PNet windows straddling the seam (cells the native path
        structurally lacks) can fire on mixed content/black — same as any
        zero extension; (b) the level resize runs as a canvas-sized (not
        native-sized) float32 contraction, so values within ~1 ulp of a
        rounding half-integer can quantize differently (≈1e-7 of pixels,
        |Δ| = 1 gray level) and nudge a PNet score.  Detections are
        bit-identical to the native path on the sample-image suite
        (tests/test_mtcnn_device.py), but exact equality is NOT a general
        guarantee — near-threshold or near-tie images can differ.
        """
        h, w = img.shape[:2]
        ch = -(-h // multiple) * multiple
        cw = -(-w // multiple) * multiple
        n_lv = n_pyramid_levels(h, w, self.cfg.min_face_size,
                                self.cfg.scale_factor)
        canvas = np.zeros((ch, cw, 3), img.dtype)
        canvas[:h, :w] = img
        if h < ch:
            canvas[h, :w] = img[h - 1]
        if w < cw:
            canvas[:h, w] = img[:, w - 1]
        if h < ch and w < cw:
            canvas[h, w] = img[h - 1, w - 1]
        # native pyramid-level extents, host-computed with the exact cv2 rint
        # ladder (bit-identical to the native plan's level sizes)
        ladder = _scale_ladder(h, w, self.cfg.min_face_size,
                               self.cfg.scale_factor)[:n_lv]
        level_hw = np.array([(lh, lw) for lh, lw, _ in ladder], np.float32)
        extent = (jnp.asarray([h, w], jnp.float32), jnp.asarray(level_hw))
        boxes, lm, count, sat = self._run_tiered(
            lambda tier: self._compiled(ch, cw, max_levels=n_lv,
                                        with_extent=True, tier=tier),
            jnp.asarray(canvas), extent, shape_key=(ch, cw, n_lv))
        self.last_saturated = bool(sat)
        n = int(count)
        if n == 0:
            return np.array([]), np.array([])
        return np.asarray(boxes)[:n], np.asarray(lm)[:n]

    def _compiled_batch(self, b: int, h: int, w: int, tier: str = "full"):
        key = ("batch", b, h, w, tier)
        if key not in self._jitted:
            # positional max_levels=None keeps the lru_cache key identical to
            # _compiled's plan for the same shape (6-arg and 7-arg calls key
            # differently and would build duplicate plans)
            plan = build_plan(h, w, self.cfg.min_face_size, self.cfg.scale_factor,
                              self.cfg.cell_size, self.cfg.stride, None)
            budgets = self._budgets_for(tier)
            fn = functools.partial(self._cascade, plan, budgets=budgets)
            self._jitted[key] = jax.jit(jax.vmap(fn, in_axes=(None, 0)))
            if len(self._jitted) > self._jitted_max:
                self._jitted.popitem(last=False)
        else:
            self._jitted.move_to_end(key)
        return self._jitted[key]

    def detect_batch(self, imgs: np.ndarray):
        """Batched same-size cascade (vmapped whole pipeline) →
        (boxes [B,out_k,5], landmarks [B,out_k,10], counts [B],
        saturated [B] bool).

        With `fast_budgets`, a single saturated image falls the WHOLE batch
        back to the full budgets (unsaturated images are tier-invariant, so
        the rerun changes nothing for them)."""
        b, h, w = imgs.shape[:3]
        boxes, lm, counts, sat = self._run_tiered(
            lambda tier: self._compiled_batch(b, h, w, tier),
            jnp.asarray(imgs), shape_key=("batch", b, h, w))
        self.last_saturated = bool(np.asarray(sat).any())
        return np.asarray(boxes), np.asarray(lm), np.asarray(counts), np.asarray(sat)


def load_device_cascade(p_path: str, r_path: str, o_path: str,
                        cfg: MTCNNConfig = MTCNN, **kw) -> MTCNNDeviceCascade:
    """Device cascade from the reference .pt checkpoints."""
    from fdt.infer.mtcnn import load_mtcnn_detector
    host = load_mtcnn_detector(p_path, r_path, o_path, cfg)
    return MTCNNDeviceCascade(host.vars["pnet"], host.vars["rnet"],
                              host.vars["onet"], cfg, **kw)
