"""SSD test-time detection head: decode → per-class threshold → NMS → fixed output.

Fixed-shape, batched, jittable re-design of layers/functions/detection.py:34-84:
the reference loops over batch and class on the host, running a Python-loop NMS
per class; here one vmapped graph produces the same zero-padded
[B, num_classes, top_k, 5] tensor ([score, x1, y1, x2, y2] rows) on device.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from fdt.config import DetectConfig
from fdt.geometry import decode
from fdt.geometry.nms import nms_padded


@functools.partial(jax.jit, static_argnames=("cfg", "budget"))
def ssd_detect(loc: jnp.ndarray, conf: jnp.ndarray, priors: jnp.ndarray,
               cfg: DetectConfig, budget: int | None = None) -> jnp.ndarray:
    """Args:
      loc:    [B, P, 4] location predictions.
      conf:   [B, P, C] softmax class scores.
      priors: [P, 4] center-form priors.
      cfg:    DetectConfig (top_k / conf_thresh / nms_thresh / nms_top_k / variance).
      budget: static override of cfg.nms_top_k (boxes entering NMS).

    Returns: [B, C, top_k, 5]; row = [score, x1, y1, x2, y2]; class 0 and rows
      past the kept count are zeros (reference detection.py:48 zero-init).
    """
    b, p, c = conf.shape
    budget = min(budget or cfg.nms_top_k, p)
    boxes = decode(loc, priors, cfg.variance)  # [B, P, 4]

    def one_class(boxes_i, scores_i):
        valid = scores_i > cfg.conf_thresh
        idx, count = nms_padded(boxes_i, scores_i, cfg.nms_thresh,
                                budget=budget, out_k=cfg.top_k, valid=valid)
        if cfg.drop_single_candidate:
            count = jnp.where(jnp.sum(valid) == 1, 0, count)
        rows = jnp.concatenate([scores_i[idx][:, None], boxes_i[idx]], axis=-1)
        keep = (jnp.arange(cfg.top_k) < count)[:, None]
        return jnp.where(keep, rows, 0.0)

    def one_image(boxes_i, conf_i):
        per_class = [jnp.zeros((cfg.top_k, 5), boxes_i.dtype)]
        for cl in range(1, c):
            per_class.append(one_class(boxes_i, conf_i[:, cl]))
        return jnp.stack(per_class, axis=0)

    return jax.vmap(one_image)(boxes, conf)
