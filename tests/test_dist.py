"""Multi-device mesh tests: sharding, implicit gradient psum, 8-device DP."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from fdt.dist import batch_sharding, make_mesh, replicated, shard_batch


def test_make_mesh_eight_devices():
    mesh = make_mesh(8)
    assert mesh.shape["data"] == 8


def test_shard_batch_places_leading_axis():
    mesh = make_mesh(8)
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    xs = shard_batch(mesh, x)
    assert xs.sharding.spec == P("data")
    np.testing.assert_array_equal(np.asarray(xs), x)


def test_dp_gradient_matches_single_device(rng):
    """Gradients of a batch-sharded loss must equal the unsharded ones — the
    SPMD partitioner inserts the psum that replaces hand-written all-reduce."""
    mesh = make_mesh(8)
    w = rng.randn(16, 4).astype(np.float32)
    x = rng.randn(8, 16).astype(np.float32)
    y = rng.randn(8, 4).astype(np.float32)

    def loss(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    g_single = jax.grad(loss)(jnp.asarray(w), jnp.asarray(x), jnp.asarray(y))

    ws = jax.device_put(w, replicated(mesh))
    xs, ys = shard_batch(mesh, (x, y))
    g_sharded = jax.jit(jax.grad(loss))(ws, xs, ys)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_single),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_dp_train_step_on_mesh(rng):
    """One real PyramidBox train step sharded over 8 devices (tiny shapes)."""
    from fdt.models.pyramidbox_mobile import build_pyramidbox
    from fdt.train import PyramidTrainer, pad_targets

    mesh = make_mesh(8)
    trainer = PyramidTrainer(build_pyramidbox("try3"), "try3", input_size=64)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state = jax.device_put(state, replicated(mesh))
    images = (rng.rand(8, 64, 64, 3) * 255).astype(np.float32)
    targets = [np.array([[0.2, 0.2, 0.6, 0.6, 0.0]], np.float32)] * 8
    batch = shard_batch(mesh, (images,) + pad_targets(targets, max_gt=4))
    state, metrics = trainer.train_step(state, *batch, 1e-4)
    assert np.isfinite(float(metrics["loss"]))
