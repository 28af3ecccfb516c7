"""Centralized, typed configuration for every detector family.

The reference scatters these knobs across files (data/config.py:4-22,
pyramid.py:113-118,198, pyramid_mb2_try3.py:144-146,216, FACEBOX/encoderl.py:21-48,
MTCNN/mtcnn/core/detect.py:73-89, iouTracke_cal.py:22-30).  Here they live in one
immutable config tree so eval/infer/train all agree.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class PriorConfig:
    """SSD-style prior grid over one or more source maps.

    Reference: layers/functions/prior_box.py:18-26 (stride/box/scale/aspect_ratios)
    """
    strides: Tuple[int, ...]
    boxes: Tuple[int, ...]
    scales: Tuple[int, ...] = ()
    aspect_ratios: Tuple[Tuple[float, ...], ...] = ()

    def __post_init__(self):
        n = len(self.strides)
        if not self.scales:
            object.__setattr__(self, "scales", (1,) * n)
        if not self.aspect_ratios:
            object.__setattr__(self, "aspect_ratios", ((),) * n)


@dataclasses.dataclass(frozen=True)
class DetectConfig:
    """Test-time decode + per-class NMS parameters.

    Reference: layers/functions/detection.py:15-32.
    """
    num_classes: int = 2
    background_label: int = 0
    top_k: int = 750           # max detections kept per class
    conf_thresh: float = 0.3
    nms_thresh: float = 0.5
    nms_top_k: int = 5000      # boxes entering NMS
    variance: Tuple[float, float] = (0.1, 0.2)
    # Reference quirk (detection.py:66-71): a class with exactly ONE candidate
    # above conf_thresh yields a 0-d tensor and is skipped.  Reproduced by
    # default for bit-faithful eval dumps; set False for the fixed behavior.
    drop_single_candidate: bool = True


@dataclasses.dataclass(frozen=True)
class PyramidConfig:
    """One PyramidBox family variant."""
    name: str
    input_size: int = 640
    num_sources: int = 6
    face_priors: PriorConfig = dataclasses.field(
        default_factory=lambda: PriorConfig(
            strides=(4, 8, 16, 32, 64, 128), boxes=(16, 32, 64, 128, 256, 512)))
    head_priors: PriorConfig = dataclasses.field(
        default_factory=lambda: PriorConfig(
            strides=(8, 16, 32, 64, 128, 128), boxes=(16, 32, 64, 128, 256, 512)))
    detect: DetectConfig = dataclasses.field(default_factory=DetectConfig)


# --- PyramidBox variants (reference: pyramid.py:113-118,198; *_try*.py) ---------------

PYRAMID_REPO = PyramidConfig(
    name="repo",
    detect=DetectConfig(conf_thresh=0.3, nms_thresh=0.5),
)

PYRAMID_TRY1 = PyramidConfig(
    name="try1",
    detect=DetectConfig(conf_thresh=0.3, nms_thresh=0.3),  # pyramid_mobile_try1.py:220
)

PYRAMID_TRY2 = PyramidConfig(
    name="try2",
    detect=DetectConfig(conf_thresh=0.3, nms_thresh=0.5),  # pyramid_mobile_try2.py:233
)

_FIVE_MAP_FACE = PriorConfig(strides=(4, 8, 16, 32, 64), boxes=(16, 32, 64, 128, 256))
_FIVE_MAP_HEAD = PriorConfig(strides=(8, 16, 32, 64, 64), boxes=(16, 32, 64, 128, 256))

PYRAMID_TRY3 = PyramidConfig(
    name="try3", num_sources=5,
    face_priors=_FIVE_MAP_FACE, head_priors=_FIVE_MAP_HEAD,
    detect=DetectConfig(conf_thresh=0.2, nms_thresh=0.35),  # pyramid_mb2_try3.py:216
)
PYRAMID_TRY4 = dataclasses.replace(PYRAMID_TRY3, name="try4")
PYRAMID_TRY5 = dataclasses.replace(PYRAMID_TRY3, name="try5")

PYRAMID_CONFIGS = {c.name: c for c in
                   (PYRAMID_REPO, PYRAMID_TRY1, PYRAMID_TRY2,
                    PYRAMID_TRY3, PYRAMID_TRY4, PYRAMID_TRY5)}

# Eval-time Detect overrides used by the metric harness (My_test.py:36, draw_curve/log:31-32)
EVAL_NMS_THRESH = 0.35

# Mean BGR pixel (SubtractMeans / detect_face preprocessing, My_test.py:25)
PIXEL_MEAN_BGR = (104.0, 117.0, 123.0)


# --- FaceBoxes -----------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class FaceBoxConfig:
    """FaceBoxes anchor-densification config (FACEBOX/encoderl.py:21-48)."""
    input_size: int = 1024
    steps: Tuple[int, ...] = (32, 64, 128)
    sizes: Tuple[int, ...] = (32, 256, 512)
    aspect_ratios: Tuple[Tuple[int, ...], ...] = ((1, 2, 4), (1,), (1,))
    feature_map_sizes: Tuple[int, ...] = (32, 16, 8)
    density: Tuple[Tuple[int, ...], ...] = ((-3, -1, 1, 3), (-1, 1), (0,))
    variance: Tuple[float, float] = (0.1, 0.2)
    conf_thresh: float = 0.35   # decode_np default (encoderl.py:308)
    nms_thresh: float = 0.5     # nms_np default (encoderl.py:218)
    match_thresh: float = 0.35  # encode() default (encoderl.py:158)


FACEBOX = FaceBoxConfig()

# The reference's alternative `decode_tensor` post-processing
# (FACEBOX/encoderl.py:327-358) pins the background column to 0.4 before an
# argmax, which reduces to keeping priors whose face probability is strictly
# above 0.4 (torch ties break toward background), then NMS at 0.5.  Its
# "no detections" rescue branch is dead code (`labels.long().sum() is 0` is
# always False for a tensor), and no reference driver calls decode_tensor
# (both call sites are commented out — FACEBOX/Video.py:38,
# FACEBOX/My_test_facebox.py:29).  We expose the behavior as a config: a
# FaceBoxDetector built with FACEBOX_PINNED produces exactly the rows a
# decode_tensor caller would get (tests/test_facebox.py pins the subset
# relation to the default decode_np path).
FACEBOX_PINNED = FaceBoxConfig(conf_thresh=0.4)


# --- MTCNN ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MTCNNConfig:
    """Cascade thresholds (MTCNN/mtcnn/core/detect.py:73-89)."""
    min_face_size: float = 12.0
    stride: int = 2
    cell_size: int = 12
    thresholds: Tuple[float, float, float] = (0.6, 0.6, 0.35)
    scale_factor: float = 0.709
    pnet_nms_per_level: float = 0.4   # 'Minimum' mode (detect.py:314)
    pnet_nms_merge: float = 0.6       # 'Union'   mode (detect.py:326)
    rnet_nms: float = 0.6             # 'Union'   mode (detect.py:431)
    onet_nms: float = 0.5             # 'Minimum' mode (detect.py:579)
    # fixed-shape budgets for the TPU formulation (padded candidate counts)
    max_pnet_boxes_per_level: int = 2048
    max_pnet_boxes: int = 4096
    max_rnet_boxes: int = 1024
    max_onet_boxes: int = 512


MTCNN = MTCNNConfig()


# --- IoU tracker (iouTracke_cal.py:22-30) --------------------------------------------

@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    use_iou: bool = True
    sigma_iou: float = 0.4
    sigma_dis: float = 8.0
    sigma_h: float = 0.6
    t_min: int = 5
    score_floor: float = 0.4   # detection score floor in the tracker driver


TRACKER = TrackerConfig()
