"""MTCNN stage training: masked losses + Adam trainers.

Re-design of MTCNN/mtcnn/core/models.py:19-69 (LossFn) and
MTCNN/mtcnn/train_net/train.py:30-227 (train_pnet/rnet/onet) as fixed-shape
jitted steps.  Loss masks by label:
  cls (BCE):       labels >= 0 (pos=1, neg=0)
  box (MSE):       labels != 0 (pos, part, landmark)
  landmark (MSE):  labels == -2
Stage weights: P/R cls·1.0 + box·0.5; O cls·0.8 + box·0.6 + landmark·1.5.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from fdt.models.mtcnn import ONet, PNet, RNet

STAGE_WEIGHTS = {  # train.py:75,141,209
    "pnet": (1.0, 0.5, 0.0),
    "rnet": (1.0, 0.5, 0.0),
    "onet": (0.8, 0.6, 1.5),
}
STAGE_SIZES = {"pnet": 12, "rnet": 24, "onet": 48}
STAGE_MODELS = {"pnet": PNet, "rnet": RNet, "onet": ONet}


def _masked_mean(values, mask):
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(values * mask) / denom


def cls_loss(gt_label, pred_prob, eps: float = 1e-7):
    """Masked BCE over labels >= 0 (models.py:32-39); pred is sigmoid output."""
    p = jnp.clip(pred_prob.reshape(-1), eps, 1 - eps)
    gt = gt_label.reshape(-1)
    mask = (gt >= 0).astype(p.dtype)
    target = jnp.clip(gt, 0.0, 1.0)
    bce = -(target * jnp.log(p) + (1 - target) * jnp.log(1 - p))
    return _masked_mean(bce, mask)


def box_loss(gt_label, gt_offset, pred_offset):
    """Masked MSE over labels != 0 (models.py:41-55); torch MSE averages over
    all 4 offset elements of the selected rows."""
    gt = gt_label.reshape(-1)
    mask = (gt != 0).astype(pred_offset.dtype)
    se = jnp.mean((pred_offset - gt_offset) ** 2, axis=-1)
    return _masked_mean(se, mask)


def landmark_loss(gt_label, gt_landmark, pred_landmark):
    """Masked MSE over labels == -2 (models.py:57-69)."""
    gt = gt_label.reshape(-1)
    mask = (gt == -2).astype(pred_landmark.dtype)
    se = jnp.mean((pred_landmark - gt_landmark) ** 2, axis=-1)
    return _masked_mean(se, mask)


def compute_accuracy(pred_prob, gt_label, thresh: float = 0.6):
    """train.py:11-27: accuracy over labels >= 0 at prob threshold 0.6."""
    p = pred_prob.reshape(-1)
    gt = gt_label.reshape(-1)
    mask = (gt >= 0).astype(p.dtype)
    ones = (p >= thresh).astype(p.dtype)
    right = (ones == gt).astype(p.dtype) * mask
    return jnp.sum(right) / jnp.maximum(jnp.sum(mask), 1.0)


class MTCNNState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


class MTCNNStageTrainer:
    """One cascade stage with Adam (train.py:42, base_lr 0.01)."""

    def __init__(self, stage: str, base_lr: float = 0.01,
                 precision: str = "default"):
        assert stage in STAGE_MODELS, stage
        self.stage = stage
        self.model = STAGE_MODELS[stage]()
        self.size = STAGE_SIZES[stage]
        self.weights = STAGE_WEIGHTS[stage]
        self.precision = precision
        self.tx = optax.adam(base_lr)
        self.train_step = jax.jit(self._train_step, donate_argnums=(0,))

    def init_state(self, rng) -> MTCNNState:
        variables = self.model.init(rng, jnp.zeros((1, self.size, self.size, 3)))
        params = variables["params"]
        return MTCNNState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=self.tx.init(params))

    def _loss(self, params, images, gt_label, gt_bbox, gt_landmark):
        with jax.default_matmul_precision(self.precision):
            out = self.model.apply({"params": params},
                                   images.astype(jnp.float32) / 255.0)
        if self.stage == "pnet":      # FCN on 12² input → [B,1,1,·] maps
            prob, box = out
            prob, box = prob[:, 0, 0, :], box[:, 0, 0, :]
            lm = None
        elif self.stage == "rnet":
            prob, box = out
            lm = None
        else:
            prob, box, lm = out
        wc, wb, wl = self.weights
        l_cls = cls_loss(gt_label, prob)
        l_box = box_loss(gt_label, gt_bbox, box)
        loss = wc * l_cls + wb * l_box
        l_lm = jnp.zeros(())
        if lm is not None:
            l_lm = landmark_loss(gt_label, gt_landmark, lm)
            loss = loss + wl * l_lm
        acc = compute_accuracy(prob, gt_label)
        return loss, (l_cls, l_box, l_lm, acc)

    def _train_step(self, state: MTCNNState, images, gt_label, gt_bbox, gt_landmark):
        (loss, (l_cls, l_box, l_lm, acc)), grads = jax.value_and_grad(
            self._loss, has_aux=True)(state.params, images, gt_label,
                                      gt_bbox, gt_landmark)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (state.replace(step=state.step + 1, params=params,
                              opt_state=opt_state),
                {"loss": loss, "cls": l_cls, "box": l_box, "landmark": l_lm,
                 "accuracy": acc})


def train_stage(stage: str, imdb, end_epoch: int, batch_size: int,
                model_store_path: str, base_lr: float = 0.01,
                frequent: int = 50, rng_seed: int = 0,
                log=print):
    """Epoch loop with per-epoch checkpoints (train.py:30-95)."""
    import os

    import numpy as np

    from fdt.data.mtcnn_data import mtcnn_batches
    from fdt.train.checkpoint import save_checkpoint

    os.makedirs(model_store_path, exist_ok=True)
    trainer = MTCNNStageTrainer(stage, base_lr)
    state = trainer.init_state(jax.random.PRNGKey(rng_seed))
    rng = np.random.RandomState(rng_seed)
    for epoch in range(1, end_epoch + 1):
        for i, (ims, label, bbox, lm) in enumerate(
                mtcnn_batches(imdb, batch_size, shuffle=True, rng=rng)):
            state, m = trainer.train_step(state, ims, label, bbox, lm)
            if i % frequent == 0:
                log(f"{stage} epoch {epoch} step {i} acc {float(m['accuracy']):.3f} "
                    f"cls {float(m['cls']):.4f} box {float(m['box']):.4f} "
                    f"loss {float(m['loss']):.4f}")
        save_checkpoint(state, model_store_path, f"{stage}_epoch", epoch)
    return state
