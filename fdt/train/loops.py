"""PyramidBox training: optimizer, train state, jitted DP train step.

Replicates the MyTrain_repo.py/MyTrain_mobile.py loop semantics on TPU:
  * torch-SGD with coupled weight decay and momentum buffer
    (buf = m·buf + (g + wd·p); p -= lr·buf) — MyTrain_repo.py:104
  * dual MultiBox loss, total = face_l + face_c + 0.5·(head_l + head_c)
    (MyTrain_repo.py:170-173)
  * xavier conv init / BN γ=1 β=0 (MyTrain_repo.py:79-96)
  * loss-history arrays in the reference's 5-row layout (MyTrain_repo.py:201-202)

The step is one jitted SPMD graph: batch sharded over the mesh `data` axis,
params replicated, gradient psum inserted by XLA from sharding annotations.
"""
from __future__ import annotations

import dataclasses
import functools
import zlib
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from fdt.anchors import (feature_map_sizes, pyramid_face_priors,
                         pyramid_head_priors)
from fdt.config import PYRAMID_CONFIGS, PyramidConfig
from fdt.train.multibox_loss import MultiBoxLossConfig, multibox_loss


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def sgd_optimizer(momentum: float = 0.6, weight_decay: float = 1e-4):
    """torch.optim.SGD-equivalent transform; lr is applied in the step."""
    return optax.chain(optax.add_decayed_weights(weight_decay),
                       optax.trace(decay=momentum))


def _xavier_kernel(path, shape, dtype, rng):
    """Deterministic xavier-uniform draw for one conv kernel leaf.

    The per-leaf key comes from a stable digest of the param path — Python's
    hash() is salted per process and would silently break same-seed
    reproducibility across runs.  Single source of truth for BOTH init paths
    (compiled xavier_init_variables and shape-only materialize_variables),
    whose bit-identity the dryrun/bench rely on."""
    kh, kw, i, o = shape
    fan_in, fan_out = i * kh * kw, o * kh * kw
    bound = float(np.sqrt(6.0 / (fan_in + fan_out)))
    key = jax.random.fold_in(
        rng, zlib.crc32(jax.tree_util.keystr(path).encode()) & 0x7FFFFFFF)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def xavier_init_variables(variables, rng):
    """Xavier-uniform conv kernels, zero biases, BN γ=1 β=0 (MyTrain_repo.py:79-96)."""

    def init_leaf(path, leaf):
        name = str(path[-1].key if hasattr(path[-1], "key") else path[-1])
        if path[0].key != "params":
            return leaf
        if name == "kernel" and leaf.ndim == 4:
            return _xavier_kernel(path, leaf.shape, leaf.dtype, rng)
        if name == "bias":
            return jnp.zeros_like(leaf)
        if name == "scale":
            return jnp.ones_like(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(init_leaf, variables)


def materialize_variables(shapes, rng):
    """Build variables directly from a jax.eval_shape variable tree.

    Same deterministic rules as xavier_init_variables (kernel → path-keyed
    xavier uniform, bias → 0, scale → 1) plus flax BatchNorm's collection
    defaults (mean → 0, var → 1); any other leaf → 0.  Skips the forward-pass
    compile that Module.init needs, so state construction is trace-free."""

    def make_leaf(path, leaf):
        name = str(path[-1].key if hasattr(path[-1], "key") else path[-1])
        if name == "kernel" and len(leaf.shape) == 4:
            return _xavier_kernel(path, leaf.shape, leaf.dtype, rng)
        if name in ("scale", "var"):
            return jnp.ones(leaf.shape, leaf.dtype)
        if name in ("bias", "mean"):
            return jnp.zeros(leaf.shape, leaf.dtype)
        # bit-identity with the compiled init path only holds for leaves the
        # rules cover (conv kernels, biases, BN); anything else (Dense
        # kernels, PReLU slopes, ...) must use the compiled path — failing
        # loudly beats silently training from zero weights
        raise ValueError(
            f"materialize_variables has no rule for leaf "
            f"{jax.tree_util.keystr(path)}; use init_state(abstract=False)")

    return jax.tree_util.tree_map_with_path(make_leaf, shapes)


def pad_targets(targets: Sequence[np.ndarray], max_gt: int | None = None):
    """List of per-image [n,5] arrays ([x1,y1,x2,y2,label], normalized) →
    (gt_boxes [B,G,4] f32, gt_labels [B,G] i32, gt_valid [B,G] bool).

    G is the smallest power of two ≥ the batch max (bucketed to bound the
    number of jit specializations).
    """
    b = len(targets)
    need = max(1, max(t.shape[0] for t in targets))
    if max_gt is None:
        max_gt = 1 << (need - 1).bit_length()
    boxes = np.zeros((b, max_gt, 4), np.float32)
    labels = np.zeros((b, max_gt), np.int32)
    valid = np.zeros((b, max_gt), bool)
    for i, t in enumerate(targets):
        n = min(t.shape[0], max_gt)
        boxes[i, :n] = t[:n, :4]
        labels[i, :n] = t[:n, 4]
        valid[i, :n] = True
    return boxes, labels, valid


class PyramidTrainer:
    """Owns the jitted train step for a PyramidBox variant."""

    def __init__(self, model, cfg: PyramidConfig | str = "repo",
                 input_size: int = 640,
                 loss_cfg: MultiBoxLossConfig = MultiBoxLossConfig(),
                 head_weight: float = 0.5, momentum: float = 0.6,
                 weight_decay: float = 1e-4, precision: str = "default",
                 freeze_predicate=None, remat: bool = False):
        if isinstance(cfg, str):
            cfg = PYRAMID_CONFIGS[cfg]
        self.cfg = cfg
        self.model = model
        self.loss_cfg = loss_cfg
        self.head_weight = head_weight
        self.precision = precision
        # remat: recompute the forward during the backward pass instead of
        # keeping every conv activation live (jax.checkpoint) — trades ~1/3
        # more FLOPs for O(batch·H·W·C) less HBM, buying bigger batches at
        # 640².  Gradients are mathematically identical (same ops re-run).
        self.remat = remat
        # backbone-freeze window (zero_grad_pretrained_layer,
        # MyTrain_mobile.py:185-186): predicate over '/'-joined param paths
        self.freeze_predicate = freeze_predicate
        self.tx = sgd_optimizer(momentum, weight_decay)
        # exact per-source shapes via abstract trace (try4/try5 break the
        # ceil-halving rule that feature_map_sizes predicts)
        from fdt.models.shapes import trace_source_shapes
        shapes = trace_source_shapes(model, None, input_size, input_size)
        self.priors_face = jnp.asarray(
            pyramid_face_priors(cfg, shapes, input_size, input_size))
        self.priors_head = jnp.asarray(
            pyramid_head_priors(cfg, shapes, input_size, input_size))
        self.input_size = input_size
        self.train_step = jax.jit(self._train_step, donate_argnums=(0,),
                                  static_argnames=("freeze",))
        # nothing donated: eval must not consume the live train state
        self._eval_loss_jit = jax.jit(self._eval_loss)

    def init_state(self, rng, xavier: bool = True,
                   abstract: bool = False) -> TrainState:
        """Fresh train state.

        abstract=True materializes the variables from a shape-only trace
        (jax.eval_shape) instead of compiling and running the forward pass —
        seconds instead of minutes on slow hosts.  Produces bit-identical
        variables to the xavier path because every PyramidBox leaf is covered
        by the same deterministic rules (xavier kernels keyed by crc32 of the
        param path; bias 0 / scale 1 / BN mean 0, var 1 — exactly flax's and
        MyTrain_repo.py:79-96's values)."""
        if abstract:
            shapes = jax.eval_shape(
                self.model.init, rng,
                jnp.zeros((1, self.input_size, self.input_size, 3)))
            variables = materialize_variables(shapes, rng)
        else:
            variables = self.model.init(rng, jnp.zeros((1, self.input_size,
                                                        self.input_size, 3)))
            if xavier:
                variables = xavier_init_variables(variables, rng)
        params = variables["params"]
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          batch_stats=variables["batch_stats"],
                          opt_state=self.tx.init(params))

    def _forward(self, params, batch_stats, images):
        with jax.default_matmul_precision(self.precision):
            return self.model.apply(
                {"params": params, "batch_stats": batch_stats}, images,
                train=True, mutable=["batch_stats"])

    def _losses(self, params, batch_stats, images, gt_boxes, gt_labels, gt_valid):
        # batches arrive f16 from prefetch_batches (transfer format — the
        # tunnel link is the step bound); all compute runs f32 from here
        images = images.astype(jnp.float32)
        fwd = jax.checkpoint(self._forward) if self.remat else self._forward
        out, mutated = fwd(params, batch_stats, images)
        # mixed-precision invariant: every model variant casts its head
        # outputs to f32 before returning (pyramidbox.py / pyramidbox_mobile.py
        # concat sites), so the matching/hard-neg-mining/log-sum-exp loss math
        # below runs in f32 regardless of the forward's compute dtype.  Checked
        # at trace time so a model that stops casting fails loudly here.
        for k in ("face_loc", "face_conf", "head_loc", "head_conf"):
            if out[k].dtype != jnp.float32:
                raise TypeError(f"model output {k!r} is {out[k].dtype}, "
                                "expected float32 (loss math must be f32)")
        l_l, l_c = multibox_loss(out["face_loc"], out["face_conf"],
                                 self.priors_face, gt_boxes, gt_labels, gt_valid,
                                 self.loss_cfg)
        h_l, h_c = multibox_loss(out["head_loc"], out["head_conf"],
                                 self.priors_head, gt_boxes, gt_labels, gt_valid,
                                 self.loss_cfg)
        loss = l_l + l_c + self.head_weight * (h_l + h_c)
        return loss, (mutated["batch_stats"], (l_l, l_c, h_l, h_c))

    def _train_step(self, state: TrainState, images, gt_boxes, gt_labels,
                    gt_valid, lr, freeze: bool = False):
        grad_fn = jax.value_and_grad(self._losses, has_aux=True)
        (loss, (batch_stats, parts)), grads = grad_fn(
            state.params, state.batch_stats, images, gt_boxes, gt_labels, gt_valid)
        if self.freeze_predicate is not None and freeze:
            grads = jax.tree_util.tree_map_with_path(
                lambda p, g: jnp.zeros_like(g)
                if self.freeze_predicate(jax.tree_util.keystr(p)) else g, grads)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p - lr * u, state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=batch_stats, opt_state=opt_state)
        metrics = {"loss": loss, "face_loc": parts[0], "face_conf": parts[1],
                   "head_loc": parts[2], "head_conf": parts[3]}
        return new_state, metrics

    def _eval_loss(self, params, batch_stats, images, gt_boxes, gt_labels,
                   gt_valid):
        loss, _ = self._losses(params, batch_stats, images, gt_boxes,
                               gt_labels, gt_valid)
        return loss

    def eval_loss(self, state: TrainState, images, gt_boxes, gt_labels, gt_valid):
        """Validation loss (MyTrain_mobile.py:211-230 eval-during-train).

        One jitted graph — the eager op-by-op dispatch this used to do made
        the every-`eval_freq` validation pass orders of magnitude slower than
        a train step at real input sizes."""
        return self._eval_loss_jit(state.params, state.batch_stats, images,
                                   gt_boxes, gt_labels, gt_valid)


class LossHistory:
    """5-row loss array matching the reference dump layout
    (total / face_loc / face_conf / head_loc / head_conf), MyTrain_repo.py:201-202.

    append() keeps the metric DEVICE arrays — forcing them to host floats
    every step would insert a device sync into the training loop and stall
    the input-pipeline/compute overlap; everything materializes in one
    device_get at save()/drain() time."""

    def __init__(self, save_point: int):
        self.save_point = save_point
        self.pending: list = []
        self.buf = np.zeros((5, save_point + 1))
        self.idx = 0

    def append(self, metrics):
        self.pending.append((metrics["loss"], metrics["face_loc"],
                             metrics["face_conf"], metrics["head_loc"],
                             metrics["head_conf"]))

    def drain(self):
        if self.pending:
            vals = np.asarray(jax.device_get(self.pending), np.float64)
            if len(vals) > self.buf.shape[1] - self.idx:
                raise IndexError(
                    f"{self.idx + len(vals)} loss rows exceed the "
                    f"save_point={self.buf.shape[1] - 1} buffer; save() "
                    f"must run at least once per save_point iterations")
            self.buf[:, self.idx:self.idx + len(vals)] = vals.T
            self.idx += len(vals)
            self.pending = []

    def save(self, path: str):
        self.drain()
        np.save(path, self.buf)
        self.buf = np.zeros_like(self.buf)
        self.idx = 0

    def reset(self):
        """Drop pending/buffered rows without writing (non-main processes of
        a multi-process run: the sidecar is process 0's to write, but every
        process must release its device metric references)."""
        self.pending = []
        self.buf = np.zeros_like(self.buf)
        self.idx = 0
