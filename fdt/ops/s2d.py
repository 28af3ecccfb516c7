"""Space-to-depth convolution rearrangements for small-channel convs on TPU.

Early detector layers (3-64 channels over megapixel maps) run at ~1% MXU
utilization: the MXU wants 128-wide contraction/output dims, and XLA pads
3/10/24-channel convs up to 128 lanes.  Packing p×p spatial phases into the
channel dimension turns those convs into K=p²·C contractions at 1/p² the
spatial extent — the standard TPU recipe for conv stems.

Two exact rearrangements (same taps, same products; float-roundoff equal):

* ``strided_s2d_kernel(k, p)`` — for a conv whose STRIDE equals p (e.g.
  FaceBoxes' 7×7/4 stem, FACEBOX/networks.py:84): each output position is one
  s2d cell, so the conv becomes a VALID ceil(kh/p)² conv over the packed
  input with no output phase packing.

* ``phase_s2d_kernel(k, p)`` — for a STRIDE-1 VALID conv (e.g. MTCNN PNet,
  MTCNN/mtcnn/core/models.py:72-119): outputs pack into p² phase groups of
  the channel dim; W[u,v,(r,s,c),(a,b,o)] = k[pu+r−a, pv+s−b, c, o].

Both builders use static gathers only, so they trace under jit with the
kernel a runtime parameter.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """[..., H, W, C] → [..., H/p, W/p, p²C] (H, W multiples of p).

    Channel order (r, s, c): row phase major, then column phase, then channel
    — the order both kernel builders assume."""
    *lead, h, w, c = x.shape
    x = x.reshape(*lead, h // p, p, w // p, p, c)
    perm = list(range(len(lead))) + [len(lead), len(lead) + 2,
                                     len(lead) + 1, len(lead) + 3,
                                     len(lead) + 4]
    return x.transpose(perm).reshape(*lead, h // p, w // p, p * p * c)


def pad_cells(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """Zero-pad the last-2 spatial dims (…HWC) to a multiple of p PLUS one
    extra p-cell, so trailing VALID positions (whose taps are all real) still
    get a second s2d cell to read; garbage appears only past the true VALID
    extent, which the caller's final slice drops."""
    *lead, h, w, _ = x.shape
    pad = [(0, 0)] * len(lead) + [(0, (-h) % p + p), (0, (-w) % p + p), (0, 0)]
    return jnp.pad(x, pad)


def strided_s2d_kernel(k: jnp.ndarray, p: int) -> jnp.ndarray:
    """Stride-p conv kernel [kh,kw,C,O] → VALID s2d kernel [U,U,p²C,O] with
    U = ceil(kh/p): W[u,v,(r,s,c),o] = k[pu+r, pv+s, c, o] (0 out of range).
    Output position (i,j) of the s2d conv equals the strided conv output at
    (i,j) (input pre-padded by the original conv's padding)."""
    kh, kw, c, o = k.shape
    u = -(-kh // p)
    d = p * np.arange(u)[:, None] + np.arange(p)[None, :]     # [U, r]
    valid = d < kh
    dc = np.minimum(d, kh - 1)
    rows = jnp.asarray(k)[dc] * jnp.asarray(valid, k.dtype)[..., None, None, None]
    w = rows[:, :, dc, :, :] * jnp.asarray(valid, k.dtype)[None, None, ...,
                                                           None, None]
    # [u, r, v, s, C, O] → [u, v, r, s, C, O] → [U, U, p²C, O]
    return w.transpose(0, 2, 1, 3, 4, 5).reshape(u, u, p * p * c, o)


def phase_s2d_kernel(k: jnp.ndarray, p: int) -> jnp.ndarray:
    """Stride-1 VALID conv kernel [kh,kw,C,O] → s2d kernel [U,U,p²C,p²O]:
    W[u,v,(r,s,c),(a,b,o)] = k[pu+r−a, pv+s−b, c, o].  Output phase (a,b) of
    cell (i,j) equals the full-res conv output at (p·i+a, p·j+b)."""
    kh, kw, c, o = k.shape
    u = ((p - 1) + (kh - 1)) // p + 1
    d = (p * np.arange(u)[:, None, None] + np.arange(p)[None, :, None]
         - np.arange(p)[None, None, :])                       # [U, r/s, a/b]
    valid = (d >= 0) & (d < kh)
    dc = np.clip(d, 0, kh - 1)
    rows = jnp.asarray(k)[dc] * jnp.asarray(valid, k.dtype)[..., None, None, None]
    w = rows[:, :, :, dc, :, :] * jnp.asarray(valid, k.dtype)[None, None, None,
                                                              ..., None, None]
    # [u, r, a, v, s, b, C, O] → [u, v, r, s, C, a, b, O]
    w = w.transpose(0, 3, 1, 4, 6, 2, 5, 7)
    return w.reshape(u, u, p * p * c, p * p * o)


def conv_valid(x: jnp.ndarray, k: jnp.ndarray, precision) -> jnp.ndarray:
    """VALID stride-1 NHWC conv for a single image [H,W,C] → [H',W',O]."""
    dn = jax.lax.conv_dimension_numbers((1,) + x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x[None], k, (1, 1), "VALID",
                                        dimension_numbers=dn,
                                        precision=precision)[0]


def conv_valid_batched(x: jnp.ndarray, k: jnp.ndarray, precision) -> jnp.ndarray:
    """VALID stride-1 NHWC conv, batched [B,H,W,C] → [B,H',W',O]."""
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, k, (1, 1), "VALID",
                                        dimension_numbers=dn,
                                        precision=precision)
