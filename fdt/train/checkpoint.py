"""Checkpoint save/restore (orbax).

The reference checkpoints torch state dicts every save_point iterations plus a
final save (MyTrain_repo.py:197-205); here the whole TrainState pytree (params,
batch stats, optimizer state, step) is saved with orbax using the same
step-suffixed naming, and a `latest` lookup implements the --resume
--start_iter restart contract (README.md:82, MyTrain_repo.py:98-100).
"""
from __future__ import annotations

import os
import re

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_checkpoint(state, directory: str, name: str, step: int) -> str:
    """Save `<directory>/<name>_<step>` (e.g. Res50_pyramid_3000)."""
    path = os.path.abspath(os.path.join(directory, f"{name}_{step}"))
    _checkpointer().save(path, jax.device_get(state), force=True)
    return path


def restore_checkpoint(path: str, template):
    """Restore into the structure of `template` (a TrainState or pytree)."""
    import orbax.checkpoint as ocp
    restored = _checkpointer().restore(
        os.path.abspath(path),
        args=ocp.args.PyTreeRestore(jax.device_get(template)))
    return restored


def latest_checkpoint(directory: str, name: str):
    """Highest-step checkpoint path or None."""
    if not os.path.isdir(directory):
        return None
    pat = re.compile(re.escape(name) + r"_(\d+)$")
    best, best_step = None, -1
    for entry in os.listdir(directory):
        m = pat.match(entry)
        if m and int(m.group(1)) > best_step:
            best, best_step = os.path.join(directory, entry), int(m.group(1))
    return best
