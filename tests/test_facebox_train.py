"""FaceBoxes trainer (new capability — the reference ships no FaceBoxes
training code; see fdt/train/facebox_train.py)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fdt.config import FACEBOX
from fdt.train.facebox_train import FaceBoxTrainer
from fdt.train.loops import pad_targets

# 256² keeps the anchor grid proportional (8²·21 + 4² + 2² = 1364 anchors)
SMALL = dataclasses.replace(FACEBOX, input_size=256, feature_map_sizes=(8, 4, 2))


@pytest.fixture(scope="module")
def trainer_state():
    trainer = FaceBoxTrainer(cfg=SMALL)
    state = trainer.init_state(jax.random.PRNGKey(0))
    return trainer, jax.device_get(state)


def make_batch(rng, b=2, size=256):
    images = (rng.rand(b, size, size, 3) * 255).astype(np.float32)
    targets = [np.array([[0.1, 0.1, 0.45, 0.5, 1.0],
                         [0.55, 0.5, 0.9, 0.95, 1.0]], np.float32)] * b
    gt_boxes, gt_labels, gt_valid = pad_targets(targets, max_gt=4)
    gt_labels = gt_valid.astype(np.int32)  # FaceBoxes face class = 1
    return images, gt_boxes, gt_labels, gt_valid


@pytest.mark.slow
def test_facebox_train_step_decreases_loss(trainer_state, rng):
    trainer, host_state = trainer_state
    state = jax.tree.map(jnp.asarray, host_state)
    batch = make_batch(rng)
    losses = []
    for _ in range(5):
        state, m = trainer.train_step(state, *batch, 1e-3)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 5


@pytest.mark.slow
def test_facebox_train_step_shards_over_mesh(trainer_state, rng):
    """The jitted step runs sharded over an 8-device DP mesh (grad psum via
    the SPMD partitioner), matching the single-device result."""
    from fdt.dist import make_mesh, replicated, shard_batch

    trainer, host_state = trainer_state
    batch = make_batch(rng, b=8)
    single = jax.tree.map(jnp.asarray, host_state)
    _, m_single = trainer.train_step(single, *batch, 1e-3)

    mesh = make_mesh(8)
    state = jax.device_put(jax.tree.map(jnp.asarray, host_state),
                           replicated(mesh))
    sharded_batch = shard_batch(mesh, batch)
    _, m_sharded = trainer.train_step(state, *sharded_batch, 1e-3)
    np.testing.assert_allclose(float(m_sharded["loss"]),
                               float(m_single["loss"]), rtol=1e-4)
