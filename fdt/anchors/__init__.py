from fdt.anchors.priors import prior_grid, pyramid_face_priors, pyramid_head_priors, feature_map_sizes
from fdt.anchors.densified import facebox_default_boxes

__all__ = [
    "prior_grid", "pyramid_face_priors", "pyramid_head_priors", "feature_map_sizes",
    "facebox_default_boxes",
]
