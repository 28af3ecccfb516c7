from fdt.geometry.boxes import (
    point_form, center_size, intersect, iou_matrix, pair_distance,
    encode, decode,
)
from fdt.geometry.nms import nms_padded, nms_keep_mask
from fdt.geometry.matching import match_default, match_ensure_max_prior

__all__ = [
    "point_form", "center_size", "intersect", "iou_matrix", "pair_distance",
    "encode", "decode",
    "nms_padded", "nms_keep_mask",
    "match_default", "match_ensure_max_prior",
]
