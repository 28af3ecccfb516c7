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


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def save_variables_npz(variables, path: str, dtype=np.float16):
    """Write model variables (params + batch_stats) as a compact npz.

    Params are cast to `dtype` (f16 by default — trained-weight artifacts
    don't need f32 storage); batch_stats stay f32 so BN inference statistics
    keep their precision.  Loadable via load_variables."""
    variables = jax.device_get(variables)
    def cast(v):  # keep f32 for any leaf that would overflow f16
        if dtype == np.float16 and np.abs(v).max() >= np.finfo(np.float16).max:
            return v.astype(np.float32)
        return v.astype(dtype)
    flat = {f"params/{k}": cast(v)
            for k, v in _flatten(variables["params"]).items()}
    flat.update({f"batch_stats/{k}": v.astype(np.float32)
                 for k, v in _flatten(variables.get("batch_stats", {})).items()})
    np.savez_compressed(path, **flat)


def save_variables_pth(variables, path: str, inverse_transforms=None):
    """Write model variables as a torch `.pth` state dict — the reverse
    interop direction: fdt-trained weights loadable by the reference repo's
    torch models (`net.load_state_dict(torch.load(path))`, pyramid.py:353-364).
    Layout inversion handled by fdt.models.torch_convert.flax_to_torch."""
    import torch

    from fdt.models.torch_convert import flax_to_torch
    sd = flax_to_torch(jax.device_get(variables),
                       inverse_transforms=inverse_transforms)
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)


def _load_variables_npz(path: str):
    out: dict = {}
    with np.load(path) as z:
        for key in z.files:
            parts = key.split("/")
            node = out
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = np.asarray(z[key], np.float32)
    out.setdefault("batch_stats", {})
    return out


def load_variables(model, path: str, input_size: int, strict: bool = False,
                   transforms=None):
    """Load model variables from a torch .pth/.pt file, an orbax checkpoint
    dir (a saved TrainState — params + batch_stats are extracted), or a
    variables .npz written by save_variables_npz.

    strict=False reproduces the reference's filtered partial state-dict load
    (pyramid.py:353-364).
    """
    if os.path.isdir(path):
        # A TrainState checkpoint (fdt.train.checkpoint.save_checkpoint).
        # Restore template-free: orbax stores the pytree under its field
        # names, so the variables can be extracted without knowing the
        # optimizer-state structure.
        import orbax.checkpoint as ocp
        raw = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
        if not (isinstance(raw, dict) and "params" in raw):
            raise ValueError(f"{path}: not a TrainState checkpoint "
                             f"(keys: {list(raw)[:6] if isinstance(raw, dict) else type(raw)})")
        return {"params": raw["params"],
                "batch_stats": raw.get("batch_stats") or {}}
    if path.endswith(".npz"):
        return _load_variables_npz(path)
    template = init_template(model, input_size)
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
