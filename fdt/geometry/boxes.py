"""Pure-JAX box algebra.

Implements the box math of the reference's layers/box_utils.py:7-258 and
utils/calc_performance.py:4-74 as vectorized, jit/vmap-friendly functions.
Everything is fixed-shape and broadcast-based — no Python loops, no data-dependent
shapes — so XLA can fuse these into surrounding graphs and tile them onto the VPU.

Conventions:
  * "point form"  = [x1, y1, x2, y2]
  * "center form" = [cx, cy, w, h]
  * batch dims broadcast: all functions accept leading batch axes via vmap.
"""
from __future__ import annotations

import jax.numpy as jnp


def point_form(boxes: jnp.ndarray) -> jnp.ndarray:
    """Center form [cx,cy,w,h] → point form [x1,y1,x2,y2].

    Reference: layers/box_utils.py:7-16.
    """
    half = boxes[..., 2:] / 2
    return jnp.concatenate([boxes[..., :2] - half, boxes[..., :2] + half], axis=-1)


def center_size(boxes: jnp.ndarray) -> jnp.ndarray:
    """Point form [x1,y1,x2,y2] → center form [cx,cy,w,h].

    Reference: layers/box_utils.py:19-28.
    """
    return jnp.concatenate([(boxes[..., 2:] + boxes[..., :2]) / 2,
                            boxes[..., 2:] - boxes[..., :2]], axis=-1)


def intersect(box_a: jnp.ndarray, box_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise intersection area, [A,4] × [B,4] → [A,B] (point form).

    Reference: layers/box_utils.py:31-67 (GPU branch; the CPU spill branch there is
    buggy — `max_xy -= max_xy` zeroes itself — and is deliberately not reproduced).
    """
    max_xy = jnp.minimum(box_a[..., :, None, 2:], box_b[..., None, :, 2:])
    min_xy = jnp.maximum(box_a[..., :, None, :2], box_b[..., None, :, :2])
    wh = jnp.clip(max_xy - min_xy, 0.0)
    return wh[..., 0] * wh[..., 1]


def iou_matrix(box_a: jnp.ndarray, box_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU (Jaccard), [A,4] × [B,4] → [A,B] (point form).

    Reference: layers/box_utils.py:70-100, FACEBOX/encoderl.py:57-91,
    utils/calc_performance.py:54-74.
    """
    inter = intersect(box_a, box_b)
    area_a = ((box_a[..., 2] - box_a[..., 0]) * (box_a[..., 3] - box_a[..., 1]))[..., :, None]
    area_b = ((box_b[..., 2] - box_b[..., 0]) * (box_b[..., 3] - box_b[..., 1]))[..., None, :]
    return inter / (area_a + area_b - inter)


def pair_distance(box_a: jnp.ndarray, box_b: jnp.ndarray) -> jnp.ndarray:
    """Center+size pseudo-distance used by the tracker's non-IoU mode.

    Reference: utils/calc_performance.py:34-51 — note the reference swaps the
    meaning of the slices (its `*_x1y1` is actually boxes[..., 2:]); we reproduce
    the resulting arithmetic exactly:
      dz  = mean(size_a - size_b);  dxy = center_b - center_a
      dist = (dz² + dx² + dy²) ** 0.25
    """
    a_hi, a_lo = box_a[..., :, None, 2:], box_a[..., :, None, :2]
    b_hi, b_lo = box_b[..., None, :, 2:], box_b[..., None, :, :2]
    a_sz = a_hi - a_lo
    b_sz = b_hi - b_lo
    d_xy = (b_hi + b_lo) / 2 - (a_hi + a_lo) / 2
    d_sz = a_sz - b_sz
    d_z = (d_sz[..., 0] + d_sz[..., 1]) / 2
    dis = d_z * d_z + d_xy[..., 0] * d_xy[..., 0] + d_xy[..., 1] * d_xy[..., 1]
    return dis ** 0.25


def encode(matched: jnp.ndarray, priors: jnp.ndarray, variances) -> jnp.ndarray:
    """SSD variance encoding of matched GT (point form) against priors (center form).

    Reference: layers/box_utils.py:213-234.
    """
    g_cxcy = (matched[..., :2] + matched[..., 2:]) / 2 - priors[..., :2]
    g_cxcy = g_cxcy / (variances[0] * priors[..., 2:])
    g_wh = (matched[..., 2:] - matched[..., :2]) / priors[..., 2:]
    g_wh = jnp.log(g_wh) / variances[1]
    return jnp.concatenate([g_cxcy, g_wh], axis=-1)


def decode(loc: jnp.ndarray, priors: jnp.ndarray, variances) -> jnp.ndarray:
    """Inverse of :func:`encode`: loc deltas + priors (center form) → point form.

    Reference: layers/box_utils.py:238-258.
    """
    cxcy = priors[..., :2] + loc[..., :2] * variances[0] * priors[..., 2:]
    wh = priors[..., 2:] * jnp.exp(loc[..., 2:] * variances[1])
    x1y1 = cxcy - wh / 2
    return jnp.concatenate([x1y1, x1y1 + wh], axis=-1)
