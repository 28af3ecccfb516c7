"""FaceBoxes anchor-densification default boxes.

Reproduces the 21,824-box grid of FACEBOX/encoderl.py:21-48 exactly, including
its enumeration order: per layer, itertools.product(range(fm), repeat=2) over
(h, w) cells, then aspect ratios, then the density offsets (layer 0 only).
Center form, normalized to [0,1] by the 1024 input size.
"""
from __future__ import annotations

import functools
import itertools

import numpy as np

from fdt.config import FaceBoxConfig, FACEBOX


@functools.lru_cache(maxsize=None)
def _facebox_default_boxes_cached(cfg: FaceBoxConfig) -> np.ndarray:
    scale = float(cfg.input_size)
    steps = [s / scale for s in cfg.steps]
    sizes = [s / scale for s in cfg.sizes]
    boxes = []
    for i, fmsize in enumerate(cfg.feature_map_sizes):
        for h, w in itertools.product(range(fmsize), repeat=2):
            cx = (w + 0.5) * steps[i]
            cy = (h + 0.5) * steps[i]
            s = sizes[i]
            for j, ar in enumerate(cfg.aspect_ratios[i]):
                if i == 0:
                    for dx, dy in itertools.product(cfg.density[j], repeat=2):
                        boxes.append((cx + dx / 8.0 * s * ar, cy + dy / 8.0 * s * ar,
                                      s * ar, s * ar))
                else:
                    boxes.append((cx, cy, s * ar, s * ar))
    return np.array(boxes, dtype=np.float32)


def facebox_default_boxes(cfg: FaceBoxConfig = FACEBOX) -> np.ndarray:
    """[21824, 4] center-form default boxes (copy-safe cached array)."""
    return _facebox_default_boxes_cached(cfg)


def facebox_encode(gt_boxes, gt_labels, gt_valid, default_boxes_cs,
                   threshold: float = 0.35):
    """FaceBoxes train-time target encoder (DataEncoder.encode, encoderl.py:158-215).

    Fixed-shape JAX version: every default box matches its best GT; every GT
    force-claims its best default (last GT wins conflicts, reproducing the
    torch scatter at encoderl.py:186); conf is 1 for matches above threshold
    and for force-assigned defaults, else 0.

    Args:
      gt_boxes: [G,4] point-form normalized GT (padded).
      gt_labels: [G] int (faces are 1 in the reference's FaceBox convention).
      gt_valid: [G] bool.
      default_boxes_cs: [P,4] center-form default boxes.
    Returns (loc [P,4], conf [P] int32).
    """
    import jax
    import jax.numpy as jnp
    from fdt.geometry.boxes import encode, iou_matrix, point_form

    df = jnp.asarray(default_boxes_cs)
    pf = point_form(df)
    overlaps = iou_matrix(jnp.asarray(gt_boxes), pf)        # [G,P]
    overlaps = jnp.where(jnp.asarray(gt_valid)[:, None], overlaps, -1.0)
    iou = jnp.max(overlaps, axis=0)                         # [P]
    max_index = jnp.argmax(overlaps, axis=0)                # [P]
    best_default = jnp.argmax(overlaps, axis=1)             # [G]

    g = gt_boxes.shape[0]

    def body(j, state):
        mi, forced = state
        p = best_default[j]
        v = gt_valid[j]
        mi = mi.at[p].set(jnp.where(v, j, mi[p]))
        forced = forced.at[p].set(forced[p] | v)
        return mi, forced

    max_index, forced = jax.lax.fori_loop(
        0, g, body, (max_index, jnp.zeros(df.shape[0], bool)))

    safe_gt = jnp.where(jnp.asarray(gt_valid)[:, None], jnp.asarray(gt_boxes),
                        jnp.array([0.0, 0.0, 1.0, 1.0]))
    matched = safe_gt[max_index]
    loc = encode(matched, df, (0.1, 0.2))
    conf = jnp.asarray(gt_labels).astype(jnp.int32)[max_index]
    conf = jnp.where(iou < threshold, 0, conf)
    conf = jnp.where(forced, 1, conf)
    conf = jnp.where(jnp.any(jnp.asarray(gt_valid)), conf, 0)
    return loc, conf
