"""GT ↔ prior matching as fixed-shape vmappable ops.

The reference matches per image inside a Python batch loop, writing into
preallocated tensors (layers/box_utils.py:103-210, layers/modules/multibox_loss.py:69-81).
Here each matcher is a pure function over ONE image with a *padded* GT tensor
([max_gt, 4] + validity mask) so the whole batch runs as one `vmap` on device.

Both matchers return (loc_t [P,4], conf_t [P] int32):
  conf_t = gt_label + 1 for matched priors, 0 (background) below `threshold`.
  loc_t  = variance-encoded regression targets (garbage where conf_t == 0 —
           the loss masks them; we substitute a unit box for invalid GT rows
           so no NaN/Inf ever enters the graph).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fdt.geometry.boxes import point_form, iou_matrix, encode

# numpy on purpose: a module-level jnp.array would initialize the default
# backend at IMPORT time — placing a stray constant on whatever accelerator
# plugin claims the default (before callers can pin a platform), and hanging
# every `import fdt.train.*` outright when the remote plugin's link is dead.
# jnp ops convert it at trace time.
_SAFE_BOX = np.array([0.0, 0.0, 1.0, 1.0], np.float32)


def _gather_targets(gt_boxes, gt_labels, gt_valid, priors, variances,
                    best_truth_overlap, best_truth_idx, threshold):
    safe_gt = jnp.where(gt_valid[:, None], gt_boxes, _SAFE_BOX)
    matches = safe_gt[best_truth_idx]                       # [P,4]
    conf = gt_labels[best_truth_idx].astype(jnp.int32) + 1  # [P]
    conf = jnp.where(best_truth_overlap < threshold, 0, conf)
    conf = jnp.where(jnp.any(gt_valid), conf, 0)
    loc = encode(matches, priors, variances)
    return loc, conf


def match_default(threshold: float, gt_boxes: jnp.ndarray, gt_labels: jnp.ndarray,
                  gt_valid: jnp.ndarray, priors: jnp.ndarray, variances):
    """Best-GT-per-prior matching (no bipartite force-assign).

    Reference: layers/box_utils.py:165-210 (`match_default`).

    Args:
      threshold: IoU below which a prior is background.
      gt_boxes:  [G,4] point-form GT, padded.
      gt_labels: [G] int labels (always 0 in the reference, so matched conf = 1).
      gt_valid:  [G] bool.
      priors:    [P,4] center-form priors.
      variances: (v_center, v_size).
    """
    overlaps = iou_matrix(gt_boxes, point_form(priors))      # [G,P]
    overlaps = jnp.where(gt_valid[:, None], overlaps, -1.0)
    best_truth_overlap = jnp.max(overlaps, axis=0)           # [P]
    best_truth_idx = jnp.argmax(overlaps, axis=0)            # [P]
    return _gather_targets(gt_boxes, gt_labels, gt_valid, priors, variances,
                           best_truth_overlap, best_truth_idx, threshold)


def match_ensure_max_prior(threshold: float, gt_boxes: jnp.ndarray, gt_labels: jnp.ndarray,
                           gt_valid: jnp.ndarray, priors: jnp.ndarray, variances):
    """Bipartite matching: every GT force-claims its best prior (overlap := 2).

    Reference: layers/box_utils.py:103-162 (`match_ensure_max_prior`), including the
    sequential `for j: best_truth_idx[best_prior_idx[j]] = j` loop whose
    last-GT-wins conflict resolution we reproduce with an ordered fori_loop.
    """
    overlaps = iou_matrix(gt_boxes, point_form(priors))      # [G,P]
    overlaps = jnp.where(gt_valid[:, None], overlaps, -1.0)
    best_truth_overlap = jnp.max(overlaps, axis=0)           # [P]
    best_truth_idx = jnp.argmax(overlaps, axis=0)            # [P]
    best_prior_idx = jnp.argmax(overlaps, axis=1)            # [G]

    g = gt_boxes.shape[0]

    def body(j, state):
        bto, bti = state
        p = best_prior_idx[j]
        v = gt_valid[j]
        bto = bto.at[p].set(jnp.where(v, 2.0, bto[p]))
        bti = bti.at[p].set(jnp.where(v, j, bti[p]))
        return bto, bti

    best_truth_overlap, best_truth_idx = jax.lax.fori_loop(
        0, g, body, (best_truth_overlap, best_truth_idx))
    return _gather_targets(gt_boxes, gt_labels, gt_valid, priors, variances,
                           best_truth_overlap, best_truth_idx, threshold)


# Batched variants: vmap over the GT/image axis, priors shared.
match_default_batch = jax.vmap(match_default, in_axes=(None, 0, 0, 0, None, None))
match_ensure_max_prior_batch = jax.vmap(match_ensure_max_prior,
                                        in_axes=(None, 0, 0, 0, None, None))
