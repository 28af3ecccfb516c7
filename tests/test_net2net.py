"""Net2net distillation smoke tests (tiny input, light student, all modes)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fdt.models.pyramidbox_mobile import build_pyramidbox
from fdt.train.net2net import Net2NetTrainer


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["intermedia", "source", "overall"])
def test_net2net_modes_smoke(mode, rng):
    # try1 student vs try1 "teacher": the trainer only requires teacher taps
    # with matching feature shapes, which the same architecture provides cheaply
    size = 128
    student = build_pyramidbox("try1")
    teacher = build_pyramidbox("try1")
    trainer = Net2NetTrainer(student, teacher, mode, input_size=size)
    teacher_vars = teacher.clone(return_features=True).init(
        jax.random.PRNGKey(1), jnp.zeros((1, size, size, 3)))
    state = trainer.init_state(jax.random.PRNGKey(0), teacher_vars)
    images = (rng.rand(2, size, size, 3) * 255).astype(np.float32)
    p_before = np.asarray(jax.tree.leaves(state.params)[0]).copy()
    losses = []
    for _ in range(3):
        # small lr keeps the step in the first-order descent regime; for
        # modes with tiny gradients the loss change can round to zero in f32,
        # so assert non-increase plus an actual parameter update
        state, m = trainer.train_step(state, images, 1e-7)
        losses.append(float(m["loss"]))
    # distillation losses between random nets are extremely sharp, so a
    # monotonic-descent assertion is numerically flaky at any fixed lr; descent
    # behavior is covered by test_train_driver.  Here: finite + step applied.
    assert all(np.isfinite(losses))
    p_after = np.asarray(jax.tree.leaves(state.params)[0])
    assert np.abs(p_after - p_before).max() > 0
    n_parts = {"intermedia": 6, "source": 6, "overall": 4}[mode]
    assert np.asarray(m["parts"]).shape == (n_parts,)
