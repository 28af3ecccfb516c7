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
