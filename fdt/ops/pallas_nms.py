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
                      keep_ref, keep_row_ref, *, mode: str):
    """Tiled greedy NMS: 128 boxes per step, matmul-form recurrences.

    Per tile (all in lane form — no transposes anywhere):
      1. ovr_t [N, 128]: overlap of ALL boxes (sublane axis, from the [N,4]
         copy) against the tile's boxes (lane axis, from the [4,N] copy).
      2. suppressed-by-earlier row [1,128] = keep_row [1,N] @ (ovr_t ≥ τ) —
         one MXU matmul; keep_ref starts all-zero so unprocessed tiles
         contribute nothing.
      3. within-tile greedy fixpoint on the [128,128] sub-block, each sweep a
         [1,128] @ [128,128] matmul (same recurrence as nms_keep_mask).
      4. write the finalized [1,128] tile segment of keep_ref.

    The VPU cost is one pass over the [N,128] block per tile (vs ~18 [1,N]
    passes per BOX in the per-box kernel), and the sequential dependency is
    per-tile, not per-box.
    """
    n = boxes_s_ref.shape[0]
    tiles = n // _LANES
    thresh = thresh_ref[0, 0]
    x1s = boxes_s_ref[:, 0:1]
    y1s = boxes_s_ref[:, 1:2]
    x2s = boxes_s_ref[:, 2:3]
    y2s = boxes_s_ref[:, 3:4]
    area_s = (x2s - x1s) * (y2s - y1s)                 # [N, 1]
    keep_row_ref[:, :] = jnp.zeros_like(keep_row_ref)

    subl = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 1)

    for ti in range(tiles):
        sl = slice(ti * _LANES, (ti + 1) * _LANES)
        # tile coords enter pre-sliced at lane offset 0 ([1,128] rows of a
        # [4T,128] buffer): Mosaic cannot broadcast a lane-OFFSET row vector
        # across sublanes
        tx1 = tiles_ref[4 * ti + 0: 4 * ti + 1, :]
        ty1 = tiles_ref[4 * ti + 1: 4 * ti + 2, :]
        tx2 = tiles_ref[4 * ti + 2: 4 * ti + 3, :]
        ty2 = tiles_ref[4 * ti + 3: 4 * ti + 4, :]
        iw = jnp.maximum(jnp.minimum(x2s, tx2) - jnp.maximum(x1s, tx1), 0.0)
        ih = jnp.maximum(jnp.minimum(y2s, ty2) - jnp.maximum(y1s, ty1), 0.0)
        inter = iw * ih                                # [N, 128]
        t_area = (tx2 - tx1) * (ty2 - ty1)             # [1, 128]
        if mode == "union":
            denom = area_s + t_area - inter
        else:  # "minimum"
            denom = jnp.minimum(area_s, t_area)
        sup = ((inter / denom) >= thresh).astype(jnp.float32)   # [N, 128]

        eprev = jax.lax.dot(keep_row_ref[:, :], sup,
                            preferred_element_type=jnp.float32)  # [1, 128]
        s_tile = sup[sl, :] * (subl < lane2)           # [128,128] j-suppresses-k
        valid_t = valid_ref[ti: ti + 1, :]
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
        keep_ref[ti: ti + 1, :] = keep_t
        keep_row_ref[:, sl] = keep_t


@functools.partial(jax.jit, static_argnames=("mode", "interpret"))
def pallas_nms_keep_tiled(boxes: jnp.ndarray, valid: jnp.ndarray, iou_thresh,
                          mode: str = "union",
                          interpret: bool = False) -> jnp.ndarray:
    """Tiled-kernel greedy-NMS keep mask (same contract as pallas_nms_keep)."""
    n = boxes.shape[0]
    n_pad = ((n + _LANES - 1) // _LANES) * _LANES
    t = n_pad // _LANES
    boxes_f = boxes.astype(jnp.float32)
    boxes_s = jnp.zeros((n_pad, 4), jnp.float32).at[:n, :].set(boxes_f)
    # [4T, 128]: tile ti's x1/y1/x2/y2 rows at 4ti..4ti+3 (lane offset 0)
    tiles_in = boxes_s.reshape(t, _LANES, 4).transpose(0, 2, 1).reshape(4 * t,
                                                                        _LANES)
    valid_tiles = jnp.zeros((n_pad,), jnp.float32).at[:n].set(
        valid.astype(jnp.float32)).reshape(t, _LANES)
    thresh = jnp.asarray(iou_thresh, jnp.float32).reshape(1, 1)

    keep = pl.pallas_call(
        functools.partial(_nms_kernel_tiled, mode=mode),
        out_shape=jax.ShapeDtypeStruct((t, _LANES), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, n_pad), jnp.float32)],
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
