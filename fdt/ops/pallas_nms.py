"""Pallas TPU kernel: exact greedy NMS over score-sorted boxes.

The XLA-level path (fdt/geometry/nms.py) materializes the full [N,N] overlap
matrix in HBM and iterates a fixpoint whose sweep count depends on suppression
chain depth.  This kernel instead keeps everything VMEM-resident (N ≤ ~8k boxes
= a few hundred KB) and runs the *literal* greedy recurrence — one masked
[1, N] VPU vector op sequence per box — so cost is deterministic O(N²/lanes)
with zero HBM traffic after the initial load.

Layout notes (see pallas guide: last dim = 128 lanes):
  * boxes enter transposed as [4, N] so each coordinate is a [1, N] lane vector;
  * the keep mask lives in a [1, N] float VMEM scratch (1.0 keep / 0.0 drop);
  * per-box scalars are read by dynamic index from the coordinate rows.

Semantics identical to nms_keep_mask / the reference greedy loops
(layers/box_utils.py:275-340): boxes already sorted by descending score,
suppress overlap >= threshold, modes "union" (IoU) and "minimum" (inter/min-area).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _nms_kernel(boxes_t_ref, valid_ref, thresh_ref, keep_ref, *, mode: str):
    n = boxes_t_ref.shape[1]
    x1 = boxes_t_ref[0:1, :]
    y1 = boxes_t_ref[1:2, :]
    x2 = boxes_t_ref[2:3, :]
    y2 = boxes_t_ref[3:4, :]
    area = (x2 - x1) * (y2 - y1)                      # [1, N]
    thresh = thresh_ref[0, 0]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    keep_ref[:, :] = valid_ref[:, :]

    def body(i, _):
        # Mosaic cannot dynamically index the lane axis, so per-box scalars
        # are extracted with a one-hot masked reduction over [1, N].
        onehot = (col == i).astype(jnp.float32)
        cur = jnp.sum(keep_ref[:, :] * onehot)
        bx1 = jnp.sum(x1 * onehot)
        by1 = jnp.sum(y1 * onehot)
        bx2 = jnp.sum(x2 * onehot)
        by2 = jnp.sum(y2 * onehot)

        iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
        ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
        inter = iw * ih
        a_i = (bx2 - bx1) * (by2 - by1)
        if mode == "union":
            denom = area + a_i - inter
        else:  # "minimum"
            denom = jnp.minimum(area, a_i)
        ovr = inter / denom
        suppress = (cur > 0.5) & (ovr >= thresh) & (col > i)
        keep_ref[:, :] = jnp.where(suppress, 0.0, keep_ref[:, :])
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def _nms_kernel_tiled(boxes_s_ref, tiles_ref, valid_ref, thresh_ref,
                      keep_ref, *, mode: str, out_k: int | None = None):
    """Tiled greedy NMS: 128 boxes per step, matmul-form recurrences.

    Per tile ti (all in lane form — no transposes anywhere):
      1. suppressed-by-earlier row [1,128]: a fori_loop over the already-
         finalized tiles tj < ti accumulates keep[tj] @ sup(tj→ti), each a
         [1,128]·[128,128] MXU matmul over a block computed on the fly.  The
         fori_loop (vs an unrolled sweep over the whole [N,128] strip) keeps
         only one [128,128] block of temporaries live, so scoped VMEM stays
         bounded for any N.
      2. within-tile greedy fixpoint on the [128,128] sub-block, each sweep a
         [1,128] @ [128,128] matmul (same recurrence as nms_keep_mask).
      3. write the finalized [1,128] tile segment of keep_ref.

    Column 4 of the box buffers is a segment id: suppression only acts within
    equal ids, solving every segment's independent greedy NMS in one pass
    (MTCNN's per-pyramid-level NMS); pass a constant column for plain NMS.

    Cost scales with the ACTUAL candidate extent, not the static budget: the
    tile loop stops after the last tile containing a valid box (callers pass
    score-sorted boxes, so sub-threshold padding is a trailing block), which
    on realistic score distributions cuts the quadratic work by 10-100x vs
    sweeping the full 5000/8192-box budget.  Exact for any validity pattern —
    skipped tiles are all-invalid (keep 0 by init) and later boxes can never
    suppress earlier ones in the greedy recurrence.

    out_k adds the dual early exit for DENSE scenes: a consumer that takes
    only the first out_k kept boxes (nms_padded's fixed output block — the
    reference keeps top_k=750 of 5000 candidates) is fully determined once
    out_k keeps have accumulated, so the tile loop also stops there.  Boxes in
    unprocessed tiles read keep=0; their true greedy status is unobservable
    through a first-out_k consumer.  The count such a consumer computes is
    also exact: it caps at out_k, and ≥out_k keeps were already found.
    """
    n = boxes_s_ref.shape[0]
    tiles = n // _LANES
    thresh = thresh_ref[0, 0]

    subl = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 1)

    keep_ref[:, :] = jnp.zeros_like(keep_ref)
    gidx = (jax.lax.broadcasted_iota(jnp.int32, (tiles, _LANES), 0) * _LANES
            + jax.lax.broadcasted_iota(jnp.int32, (tiles, _LANES), 1)
            ).astype(jnp.float32)
    extent = jnp.max((gidx + 1.0) * valid_ref[:, :])   # 1 + last valid index
    tiles_active = jnp.minimum(
        jnp.ceil(extent / _LANES), float(tiles)).astype(jnp.int32)

    def sup_block(row0, tx1, ty1, tx2, ty2, seg_t, t_area):
        """[128,128] suppression block: rows row0..row0+127 vs the tile."""
        rows = pl.ds(row0, _LANES)
        x1s = boxes_s_ref[rows, 0:1]
        y1s = boxes_s_ref[rows, 1:2]
        x2s = boxes_s_ref[rows, 2:3]
        y2s = boxes_s_ref[rows, 3:4]
        seg_s = boxes_s_ref[rows, 4:5]
        area_s = (x2s - x1s) * (y2s - y1s)
        iw = jnp.maximum(jnp.minimum(x2s, tx2) - jnp.maximum(x1s, tx1), 0.0)
        ih = jnp.maximum(jnp.minimum(y2s, ty2) - jnp.maximum(y1s, ty1), 0.0)
        inter = iw * ih                                # [128, 128]
        if mode == "union":
            denom = area_s + t_area - inter
        else:  # "minimum"
            denom = jnp.minimum(area_s, t_area)
        return (((inter / denom) >= thresh)
                & (seg_s == seg_t)).astype(jnp.float32)

    def tile_body(carry):
        ti, kept_so_far = carry
        # tile coords enter pre-sliced at lane offset 0 ([5,128] block of a
        # [5T,128] buffer): Mosaic cannot broadcast a lane-OFFSET row vector
        # across sublanes
        tc = tiles_ref[pl.ds(5 * ti, 5), :]
        tx1, ty1 = tc[0:1, :], tc[1:2, :]
        tx2, ty2 = tc[2:3, :], tc[3:4, :]
        seg_t = tc[4:5, :]
        t_area = (tx2 - tx1) * (ty2 - ty1)             # [1, 128]

        def acc(tj, eprev):
            sup_c = sup_block(tj * _LANES, tx1, ty1, tx2, ty2, seg_t, t_area)
            kr = keep_ref[pl.ds(tj, 1), :]             # [1, 128], finalized
            return eprev + jax.lax.dot(kr, sup_c,
                                       preferred_element_type=jnp.float32)

        eprev = jax.lax.fori_loop(0, ti, acc, jnp.zeros((1, _LANES),
                                                        jnp.float32))
        s_tile = (sup_block(ti * _LANES, tx1, ty1, tx2, ty2, seg_t, t_area)
                  * (subl < lane2))                    # [128,128] j-suppresses-k
        valid_t = valid_ref[pl.ds(ti, 1), :]
        keep0 = valid_t * (1.0 - jnp.minimum(eprev, 1.0))

        def cond(state):
            keep_t, prev, it = state
            return (it < _LANES) & jnp.any(keep_t != prev)

        def body(state):
            keep_t, _, it = state
            supped = jax.lax.dot(keep_t, s_tile,
                                 preferred_element_type=jnp.float32)
            new = keep0 * (1.0 - jnp.minimum(supped, 1.0))
            return new, keep_t, it + 1

        keep_t, _, _ = jax.lax.while_loop(
            cond, body, (keep0, 1.0 - keep0, jnp.int32(0)))
        keep_ref[pl.ds(ti, 1), :] = keep_t
        return ti + 1, kept_so_far + jnp.sum(keep_t)

    def tile_cond(carry):
        ti, kept_so_far = carry
        more = ti < tiles_active
        if out_k is not None:
            more &= kept_so_far < float(out_k)
        return more

    jax.lax.while_loop(tile_cond, tile_body,
                       (jnp.int32(0), jnp.float32(0.0)))


@functools.partial(jax.jit, static_argnames=("mode", "interpret", "out_k"))
def pallas_nms_keep_tiled(boxes: jnp.ndarray, valid: jnp.ndarray, iou_thresh,
                          mode: str = "union", seg_id: jnp.ndarray | None = None,
                          interpret: bool = False,
                          out_k: int | None = None) -> jnp.ndarray:
    """Tiled-kernel greedy-NMS keep mask (same contract as pallas_nms_keep).

    seg_id: optional [N] int segment ids — suppression only acts within a
    segment (every segment's greedy NMS solved in one pass, matching
    nms_keep_mask's seg_id semantics).

    out_k: static — when set, ONLY the first out_k kept boxes are guaranteed
    in the mask (tiles past the out_k-th keep read False).  Exact for
    consumers that take the first out_k keeps (nms_padded); do not combine
    with seg_id (the cap is global, not per segment)."""
    assert not (seg_id is not None and out_k is not None), \
        "out_k early-exit is global; incompatible with per-segment NMS"
    n = boxes.shape[0]
    n_pad = ((n + _LANES - 1) // _LANES) * _LANES
    t = n_pad // _LANES
    boxes_f = boxes.astype(jnp.float32)
    seg = (jnp.zeros((n,), jnp.float32) if seg_id is None
           else seg_id.astype(jnp.float32))
    # column 4 carries the segment id; padding rows get segment -2 (never
    # matches a real segment, and they are invalid anyway)
    boxes_s = jnp.full((n_pad, 5), -2.0, jnp.float32)
    boxes_s = boxes_s.at[:n, :4].set(boxes_f).at[:n, 4].set(seg)
    # [5T, 128]: tile ti's x1/y1/x2/y2/seg rows at 5ti..5ti+4 (lane offset 0)
    tiles_in = boxes_s.reshape(t, _LANES, 5).transpose(0, 2, 1).reshape(5 * t,
                                                                        _LANES)
    valid_tiles = jnp.zeros((n_pad,), jnp.float32).at[:n].set(
        valid.astype(jnp.float32)).reshape(t, _LANES)
    thresh = jnp.asarray(iou_thresh, jnp.float32).reshape(1, 1)

    keep = pl.pallas_call(
        functools.partial(_nms_kernel_tiled, mode=mode, out_k=out_k),
        out_shape=jax.ShapeDtypeStruct((t, _LANES), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(boxes_s, tiles_in, valid_tiles, thresh)
    return keep.reshape(-1)[:n] > 0.5


@functools.partial(jax.jit, static_argnames=("mode", "interpret"))
def pallas_nms_keep(boxes: jnp.ndarray, valid: jnp.ndarray, iou_thresh,
                    mode: str = "union", interpret: bool = False) -> jnp.ndarray:
    """Greedy-NMS keep mask over descending-score boxes (Pallas TPU kernel).

    Args:
      boxes: [N,4] point form, sorted by descending score.  N is padded to a
        multiple of 128 internally.
      valid: [N] bool.
      iou_thresh: scalar threshold (suppress overlap >= thresh).
      mode: "union" | "minimum".
      interpret: run in interpreter mode (CPU testing).

    Returns [N] bool keep mask.
    """
    n = boxes.shape[0]
    n_pad = ((n + _LANES - 1) // _LANES) * _LANES
    boxes_t = jnp.zeros((4, n_pad), jnp.float32).at[:, :n].set(boxes.T.astype(jnp.float32))
    valid_row = jnp.zeros((1, n_pad), jnp.float32).at[0, :n].set(valid.astype(jnp.float32))
    thresh = jnp.asarray(iou_thresh, jnp.float32).reshape(1, 1)

    keep = pl.pallas_call(
        functools.partial(_nms_kernel, mode=mode),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(boxes_t, valid_row, thresh)
    return keep[0, :n] > 0.5
