"""Source-shape probing via abstract tracing.

The reference computes priors from the ACTUAL conv output shapes on the first
forward (pyramid.py:270-286).  Most variants follow the ceil-halving rule that
fdt.anchors.feature_map_sizes predicts, but try4/try5 deliberately break it
(7×7/pad-1 stem — pyramid_mb2_try4.py:16; 1×1/pad-1 smooths that GROW maps —
try4.py:190-191).  This helper recovers the true per-source shapes for any
variant with a zero-cost jax.eval_shape trace (no compile, no compute).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def trace_source_shapes(model, variables, height: int, width: int):
    """→ tuple of (f_width, f_height) per source, from an abstract trace.

    `variables` may be concrete or a ShapeDtypeStruct tree; if None, the
    model's init is traced abstractly first.
    """
    if variables is None:
        variables = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, height, width, 3))))
    captured = []

    def probe(v):
        out = model.apply(v, jnp.zeros((1, height, width, 3)))
        captured.append(out["source_shapes"])
        return out["face_loc"]

    jax.eval_shape(probe, variables)
    return captured[0]
