"""Where will jitted code actually run?  Single source of truth.

Some environments ship accelerator plugins that ignore JAX_PLATFORMS and
claim the default backend (e.g. a tunneled single-TPU 'axon' platform) while
tests/tools pin the default DEVICE to CPU.  Every impl-selection policy
(Pallas vs XLA NMS, space-to-depth vs direct convs, matmul vs gather crops)
must therefore consult the pinned default device first and only then fall
back to the default backend.
"""
from __future__ import annotations

import jax


def default_platform() -> str:
    """Platform name ('tpu'/'cpu'/...) of the device jitted code runs on:
    the explicitly pinned default device if set, else the default backend."""
    pinned = jax.config.jax_default_device
    return pinned.platform if pinned is not None else jax.default_backend()
