"""Net2net feature distillation ("train network with network").

Re-design of train_net2net/Train_net2net_linux.py:117-219: a frozen ResNet50
PyramidBox teacher supervises a mobile student through MSE on intermediate
tensors.  The twin model files of the reference (pyramid_train*.py returning
(output, intermedia, sources)) are replaced by the models' `return_features`
flag; teacher forward runs under stop_gradient inside the same jitted step.

Modes (Train_net2net_linux.py:151-191):
  intermedia  Σ w_i · MSE(c_i_student, c_i_teacher), w = [12,12,12,12,8,8]
  source      Σ 128 · MSE over the 6 SSH source maps
  overall     Σ w · MSE over (face_loc, face_conf, head_loc, head_conf),
              w = [4, 1, 4, 1]  (the reference's zero-weight prior terms dropped)
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from fdt.train.loops import TrainState, sgd_optimizer, xavier_init_variables

INTERMEDIA_WEIGHTS = (12.0, 12.0, 12.0, 12.0, 8.0, 8.0)
SOURCE_WEIGHT = 128.0
OVERALL_WEIGHTS = (4.0, 1.0, 4.0, 1.0)


def _mse(a, b):
    return jnp.mean((a - b) ** 2)


class Net2NetTrainer:
    """Distillation trainer: student learns the teacher's internal tensors."""

    def __init__(self, student_model, teacher_model, mode: str = "intermedia",
                 momentum: float = 0.5, weight_decay: float = 1e-4,
                 input_size: int = 640, precision: str = "default"):
        assert mode in ("intermedia", "source", "overall"), mode
        self.mode = mode
        self.student = student_model.clone(return_features=True)
        self.teacher = teacher_model.clone(return_features=True)
        self.input_size = input_size
        self.precision = precision
        self.tx = sgd_optimizer(momentum, weight_decay)
        self.teacher_variables = None
        self.train_step = jax.jit(self._train_step, donate_argnums=(0,))

    def init_state(self, rng, teacher_variables) -> TrainState:
        """Xavier-init student (Train_net2net_linux.py:86-101); teacher frozen."""
        self.teacher_variables = jax.tree.map(jax.lax.stop_gradient,
                                              teacher_variables)
        variables = self.student.init(
            rng, jnp.zeros((1, self.input_size, self.input_size, 3)))
        variables = xavier_init_variables(variables, rng)
        params = variables["params"]
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          batch_stats=variables["batch_stats"],
                          opt_state=self.tx.init(params))

    def _loss(self, params, batch_stats, images):
        # f16 transfer format from prefetch_batches; compute in f32
        images = images.astype(jnp.float32)
        with jax.default_matmul_precision(self.precision):
            s_out, mutated = self.student.apply(
                {"params": params, "batch_stats": batch_stats}, images,
                train=True, mutable=["batch_stats"])
            t_out = self.teacher.apply(self.teacher_variables, images)
        t_out = jax.tree.map(jax.lax.stop_gradient,
                             {k: v for k, v in t_out.items()
                              if k != "source_shapes"})
        if self.mode == "intermedia":
            parts = [_mse(a, b) for a, b in zip(s_out["features"], t_out["features"])]
            loss = sum(w * p for w, p in zip(INTERMEDIA_WEIGHTS, parts))
        elif self.mode == "source":
            parts = [_mse(a, b) for a, b in zip(s_out["sources"], t_out["sources"])]
            loss = sum(SOURCE_WEIGHT * p for p in parts)
        else:
            keys = ("face_loc", "face_conf", "head_loc", "head_conf")
            parts = [_mse(s_out[k], t_out[k]) for k in keys]
            loss = sum(w * p for w, p in zip(OVERALL_WEIGHTS, parts))
        return loss, (mutated["batch_stats"], jnp.stack(parts))

    def _train_step(self, state: TrainState, images, lr):
        (loss, (batch_stats, parts)), grads = jax.value_and_grad(
            self._loss, has_aux=True)(state.params, state.batch_stats, images)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p - lr * u, state.params, updates)
        return (state.replace(step=state.step + 1, params=params,
                              batch_stats=batch_stats, opt_state=opt_state),
                {"loss": loss, "parts": parts})
