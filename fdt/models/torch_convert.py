"""Mechanical torch state-dict → flax variables conversion.

Because every fdt model names its flax submodules after the reference's torch
module paths (Sequential indices as '0'/'1', torch's '.' spelled '__'), a
checkpoint converts by walking our own initialized variable tree and pulling
each leaf from the state dict:

  params/<mod>/kernel  (4D) ← <mod>.weight transposed (O,I,kH,kW) → (kH,kW,I,O)
  params/<mod>/kernel  (2D) ← <mod>.weight transposed (O,I)       → (I,O)
  params/<mod>/bias         ← <mod>.bias
  params/<mod>/scale        ← <mod>.weight            (BatchNorm γ)
  params/<mod>/negative_slope ← <mod>.weight          (PReLU)
  batch_stats/<mod>/mean    ← <mod>.running_mean
  batch_stats/<mod>/var     ← <mod>.running_var

Reference load contract: pyramid.py:353-364 (`load_weights` partial state-dict
load) — `strict=False` reproduces that filtered-update behavior.
"""
from __future__ import annotations

from typing import Mapping

import jax
import numpy as np


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a .pt/.pth state dict into numpy (torch CPU import kept local)."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):  # pickled full module
        sd = sd.state_dict()
    return {k: v.detach().numpy() for k, v in sd.items()
            if not k.endswith("num_batches_tracked")}


_LEAF_TO_TORCH = {
    "kernel": "weight",
    "bias": "bias",
    "scale": "weight",
    "negative_slope": "weight",
    "mean": "running_mean",
    "var": "running_var",
}


def _torch_key(path) -> str:
    mods = [str(p.key if hasattr(p, "key") else p) for p in path[1:-1]]
    leaf = str(path[-1].key if hasattr(path[-1], "key") else path[-1])
    prefix = ".".join(mods).replace("__", ".")
    suffix = _LEAF_TO_TORCH[leaf]
    return f"{prefix}.{suffix}" if prefix else suffix


def torch_to_flax(state_dict: Mapping[str, np.ndarray], variables,
                  strict: bool = True, prefix: str = "", transforms=None):
    """Fill a flax variables pytree from a torch state dict.

    Args:
      state_dict: torch name → numpy array.
      variables: flax variables as produced by Module.init (template for shapes).
      strict: if True, raise on any missing key or shape mismatch; if False,
        keep the template value for missing keys (reference partial-load
        semantics, pyramid.py:359-361).
      prefix: optional torch-side prefix to prepend (e.g. "module.").
      transforms: optional {torch_key: fn} applied to the raw torch array
        before the generic layout transpose (e.g. NCHW→NHWC flatten fixups).
    """
    missing: list[str] = []
    transforms = transforms or {}

    def fill(path, leaf):
        key = prefix + _torch_key(path)
        if key not in state_dict:
            missing.append(key)
            return leaf
        w = np.asarray(state_dict[key])
        if key in transforms:
            w = np.asarray(transforms[key](w))
        if w.ndim == 4:
            w = w.transpose(2, 3, 1, 0)
        elif w.ndim == 2:
            w = w.T
        if w.size == 1 and np.ndim(leaf) == 0:
            w = w.reshape(())
        if w.shape != np.shape(leaf):
            raise ValueError(f"shape mismatch for {key}: torch {w.shape} vs flax "
                             f"{np.shape(leaf)} at {jax.tree_util.keystr(path)}")
        return w.astype(np.asarray(leaf).dtype)

    out = jax.tree_util.tree_map_with_path(fill, variables)
    if strict and missing:
        raise KeyError(f"missing torch keys: {missing[:10]}"
                       f"{' …' if len(missing) > 10 else ''}")
    return out


def flax_to_torch(variables, prefix: str = "",
                  inverse_transforms=None, extra=None) -> dict[str, np.ndarray]:
    """Inverse of torch_to_flax: flax variables → torch state-dict (numpy).

    Lets reference users take fdt-trained weights BACK to the torch repo:
    4D kernels (kH,kW,I,O) → (O,I,kH,kW), 2D (I,O) → (O,I), BN
    scale/mean/var → weight/running_mean/running_var, scalar leaves (PReLU)
    → shape-(1,) tensors, plus the `num_batches_tracked` bookkeeping entry
    torch BatchNorm modules expect on a strict load_state_dict.

    inverse_transforms: {torch_key: fn} applied AFTER the layout transpose —
    must invert any import-side `transforms` fixups (e.g.
    mtcnn_linear_transforms(net, inverse=True)).  Round-trip with
    torch_to_flax is bit-exact for f32 variables (tests/test_torch_export.py).

    extra: {torch_key: array} appended verbatim — for parameters the torch
    module DEFINES but never runs, which a strict load_state_dict still
    demands (e.g. MTCNN's dead landmark heads, mtcnn_export_extras).
    """
    inverse_transforms = inverse_transforms or {}
    sd: dict[str, np.ndarray] = dict(extra or {})

    def emit(path, leaf):
        key = prefix + _torch_key(path)
        w = np.asarray(leaf, np.float32)  # torch reference nets are f32
        if w.ndim == 4:
            w = w.transpose(3, 2, 0, 1)
        elif w.ndim == 2:
            w = w.T
        elif w.ndim == 0:
            w = w.reshape(1)  # torch PReLU() weight is shape (1,)
        if key in inverse_transforms:
            w = np.asarray(inverse_transforms[key](w))
        sd[key] = np.ascontiguousarray(w)
        leaf_name = str(path[-1].key if hasattr(path[-1], "key") else path[-1])
        if str(path[0].key) == "batch_stats" and leaf_name == "mean":
            sd[key.rsplit(".", 1)[0] + ".num_batches_tracked"] = \
                np.array(0, np.int64)
        return leaf

    jax.tree_util.tree_map_with_path(emit, variables)
    return sd
