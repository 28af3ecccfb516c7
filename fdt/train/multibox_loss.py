"""SSD MultiBox loss with hard negative mining — fixed-shape, fully on device.

Re-design of layers/modules/multibox_loss.py:9-136: the reference matches GT per
image in a host loop and selects pos/neg by boolean fancy-indexing (dynamic
shapes); here matching is vmapped (fdt.geometry.matching) and mining is the same
sort-of-sort rank trick expressed with static shapes, so the whole loss is one
differentiable XLA graph.

Semantics preserved exactly:
  * smooth-L1 (sum) over positive priors' encoded offsets
  * softmax CE with hard negatives at `negpos_ratio`:1, per image
    (rank over nonpositive CE, num_neg = clamp(ratio·num_pos, P-1))
  * normalization by total positives N; empty-selection → loss_c = 10, N = 1;
    N == 0 → N = batch_size (multibox_loss.py:124-134)
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from fdt.geometry.matching import (match_default_batch,
                                   match_ensure_max_prior_batch)


@dataclasses.dataclass(frozen=True)
class MultiBoxLossConfig:
    """MyTrain_repo.py:105-114 criterion parameters."""
    num_classes: int = 2
    overlap_thresh: float = 0.35
    negpos_ratio: int = 3
    bipartite: bool = False
    variances: Tuple[float, float] = (0.1, 0.2)


def multibox_loss(loc_data: jnp.ndarray, conf_data: jnp.ndarray, priors: jnp.ndarray,
                  gt_boxes: jnp.ndarray, gt_labels: jnp.ndarray, gt_valid: jnp.ndarray,
                  cfg: MultiBoxLossConfig = MultiBoxLossConfig()):
    """Args:
      loc_data:  [B, P, 4] predicted offsets.
      conf_data: [B, P, C] class logits.
      priors:    [P, 4] center-form priors.
      gt_boxes:  [B, G, 4] padded point-form GT (normalized).
      gt_labels: [B, G] int labels (0 for faces).
      gt_valid:  [B, G] bool.

    Returns (loss_l, loss_c) scalars.
    """
    b, p, c = conf_data.shape
    match = match_ensure_max_prior_batch if cfg.bipartite else match_default_batch
    loc_t, conf_t = match(cfg.overlap_thresh, gt_boxes, gt_labels, gt_valid,
                          priors, cfg.variances)
    return multibox_loss_from_targets(loc_data, conf_data, loc_t, conf_t,
                                      cfg.negpos_ratio)


def multibox_loss_from_targets(loc_data, conf_data, loc_t, conf_t,
                               negpos_ratio: int = 3):
    """The loss tail for already-encoded targets (loc_t [B,P,4], conf_t [B,P]
    int class ids) — shared by the SSD matcher path above and trainers whose
    encoders produce targets directly (FaceBoxes densified encoder)."""
    b, p, c = conf_data.shape
    loc_t = jax.lax.stop_gradient(loc_t)
    conf_t = jax.lax.stop_gradient(conf_t)

    pos = conf_t > 0                                     # [B, P]

    # localization: smooth-L1 (sum) over positives
    diff = jnp.abs(loc_data - loc_t)
    sl1 = jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5)
    loss_l = jnp.sum(sl1 * pos[..., None])

    # per-prior softmax CE
    lse = jax.nn.logsumexp(conf_data, axis=-1)           # [B, P]
    gathered = jnp.take_along_axis(conf_data, conf_t[..., None], axis=-1)[..., 0]
    ce = lse - gathered                                  # [B, P]

    # hard negative mining: rank nonpositive CE descending per image
    ce_rank = jnp.where(pos, 0.0, ce)
    order = jnp.argsort(-ce_rank, axis=1)
    rank = jnp.argsort(order, axis=1)
    num_pos = jnp.sum(pos, axis=1, keepdims=True)        # [B, 1]
    num_neg = jnp.clip(negpos_ratio * num_pos, max=p - 1)
    neg = rank < num_neg

    sel = pos | neg
    loss_c = jnp.sum(ce * sel)

    n = jnp.sum(num_pos).astype(jnp.float32)
    has_sel = jnp.any(sel)
    loss_c = jnp.where(has_sel, loss_c, 10.0)
    n = jnp.where(has_sel, n, 1.0)
    n = jnp.where(n == 0, float(b), n)
    return loss_l / n, loss_c / n
