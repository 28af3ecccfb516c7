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
