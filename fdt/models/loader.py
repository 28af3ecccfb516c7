"""Weight loading front-door: torch checkpoints or orbax directories."""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def init_template(model, input_size: int):
    """Zero-filled variables with the right structure/shapes (no compile)."""
    tmpl = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0),
                                             jnp.zeros((1, input_size, input_size, 3))))
    return jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), tmpl)


def load_variables(model, path: str, input_size: int, strict: bool = False,
                   transforms=None):
    """Load model variables from a torch .pth/.pt file or an orbax checkpoint dir.

    strict=False reproduces the reference's filtered partial state-dict load
    (pyramid.py:353-364).
    """
    template = init_template(model, input_size)
    if os.path.isdir(path):
        from fdt.train.checkpoint import restore_checkpoint
        state = restore_checkpoint(path, template)
        return state
    from fdt.models.torch_convert import load_torch_state_dict, torch_to_flax
    return torch_to_flax(load_torch_state_dict(path), template, strict=strict,
                         transforms=transforms)


def load_pyramidbox_detector(variant: str, weights: str | None,
                             input_size: int = 640, **kw):
    """Build a ready PyramidBoxDetector for any variant; random init if no weights."""
    from fdt.infer.pyramidbox import PyramidBoxDetector
    from fdt.models.pyramidbox_mobile import build_pyramidbox

    model = build_pyramidbox(variant)
    if weights:
        variables = load_variables(model, weights, input_size)
    else:
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, input_size, input_size, 3)))
    return PyramidBoxDetector(variables, model, variant, **kw)


def load_facebox_detector(weights: str, **kw):
    from fdt.infer.facebox import FaceBoxDetector
    from fdt.models.facebox import FaceBox
    variables = load_variables(FaceBox(), weights, 128, strict=True)
    return FaceBoxDetector(variables, **kw)
