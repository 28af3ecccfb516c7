"""Prior-count ↔ head-output consistency for every variant (abstract trace only).

Catches the try4/try5 shape quirks (7×7/pad-1 stem, map-growing 1×1/pad-1
smooths) that break the ceil-halving shape rule.
"""
import jax
import jax.numpy as jnp
import pytest

from fdt.anchors import pyramid_face_priors, pyramid_head_priors
from fdt.config import PYRAMID_CONFIGS
from fdt.models.pyramidbox_mobile import build_pyramidbox
from fdt.models.shapes import trace_source_shapes


@pytest.mark.parametrize("variant", ["repo", "try1", "try2", "try3", "try4", "try5"])
def test_priors_match_head_outputs(variant):
    size = 128
    model = build_pyramidbox(variant)
    shapes = trace_source_shapes(model, None, size, size)
    cfg = PYRAMID_CONFIGS[variant]
    face_p = pyramid_face_priors(cfg, shapes, size, size)
    head_p = pyramid_head_priors(cfg, shapes, size, size)

    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3))))
    out = jax.eval_shape(
        lambda v: model.apply(v, jnp.zeros((1, size, size, 3))), variables)
    assert out["face_loc"].shape[1] == face_p.shape[0], variant
    assert out["head_loc"].shape[1] == head_p.shape[0], variant
