"""Training driver integration tests on a tiny synthetic dataset (light models)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fdt.train.checkpoint import (latest_checkpoint, restore_checkpoint,
                                  save_checkpoint)
from fdt.train.loops import PyramidTrainer, pad_targets, xavier_init_variables


@pytest.fixture(scope="module")
def _tiny_trainer_base():
    from fdt.models.pyramidbox_mobile import build_pyramidbox
    model = build_pyramidbox("try3")
    trainer = PyramidTrainer(model, "try3", input_size=128,
                             freeze_predicate=lambda p: "features" in p)
    state = trainer.init_state(jax.random.PRNGKey(0))
    return trainer, jax.device_get(state)


@pytest.fixture()
def tiny_trainer(_tiny_trainer_base):
    # fresh device copy per test: the train step donates its input state
    trainer, host_state = _tiny_trainer_base
    return trainer, jax.tree.map(jnp.asarray, host_state)


def make_batch(rng, b=2, size=128):
    images = (rng.rand(b, size, size, 3) * 255).astype(np.float32)
    targets = [np.array([[0.1, 0.1, 0.5, 0.5, 0.0]], np.float32)] * b
    return (images,) + pad_targets(targets, max_gt=4)


@pytest.mark.slow
def test_train_step_decreases_loss(tiny_trainer, rng):
    trainer, state = tiny_trainer
    batch = make_batch(rng)
    losses = []
    for _ in range(4):
        state, m = trainer.train_step(state, *batch, 1e-3)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_freeze_keeps_backbone_fixed(tiny_trainer, rng):
    trainer, state = tiny_trainer
    batch = make_batch(rng)
    bb_key = next(k for k in state.params if k.startswith("features"))
    before = np.asarray(jax.tree.leaves(state.params[bb_key])[0]).copy()
    # snapshot before the step: train_step donates `state`
    head_before = np.asarray(state.params["face_conf__0"]["kernel"]).copy()
    state2, _ = trainer.train_step(state, *batch, 1e-2, freeze=True)
    after = np.asarray(jax.tree.leaves(state2.params[bb_key])[0])
    # gradients are zeroed, but (like torch zero_grad + SGD step) the coupled
    # weight decay still shifts params by lr·wd·p = 1e-6·p
    np.testing.assert_allclose(after, before * (1 - 1e-2 * 1e-4), atol=1e-7)
    # heads did move
    head_after = np.asarray(state2.params["face_conf__0"]["kernel"])
    assert np.abs(head_after - head_before).max() > 0


@pytest.mark.slow
def test_checkpoint_roundtrip(tiny_trainer, tmp_path, rng):
    trainer, state = tiny_trainer
    batch = make_batch(rng)
    state, _ = trainer.train_step(state, *batch, 1e-3)
    path = save_checkpoint(state, str(tmp_path), "try3_pyramid", 7)
    assert latest_checkpoint(str(tmp_path), "try3_pyramid") == path
    restored = restore_checkpoint(path, state)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored["params"]
                    if isinstance(restored, dict) else restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_load_variables_from_checkpoint_and_npz(tiny_trainer, tmp_path):
    """loader front-door: orbax TrainState dir and variables .npz both yield
    {params, batch_stats} usable by the detectors."""
    from fdt.models.loader import load_variables, save_variables_npz
    trainer, state = tiny_trainer
    path = save_checkpoint(state, str(tmp_path), "try3_pyramid", 3)
    variables = load_variables(None, path, 128)
    assert set(variables) >= {"params", "batch_stats"}
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(variables["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    npz = str(tmp_path / "try3.npz")
    save_variables_npz(variables, npz)
    back = load_variables(None, npz, 128)
    flat_a = jax.tree.leaves(variables["params"])
    flat_b = jax.tree.leaves(back["params"])
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):  # f16 storage tolerance
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
    for a, b in zip(jax.tree.leaves(variables["batch_stats"]),
                    jax.tree.leaves(back["batch_stats"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_xavier_init_statistics():
    variables = {"params": {"conv": {"kernel": np.ones((3, 3, 16, 32), np.float32),
                                     "bias": np.ones(32, np.float32)},
                            "bn": {"scale": np.zeros(8, np.float32),
                                   "bias": np.ones(8, np.float32)}}}
    out = xavier_init_variables(variables, jax.random.PRNGKey(0))
    k = np.asarray(out["params"]["conv"]["kernel"])
    bound = np.sqrt(6.0 / (16 * 9 + 32 * 9))
    assert k.min() >= -bound and k.max() <= bound
    assert abs(k.mean()) < bound / 10
    np.testing.assert_array_equal(np.asarray(out["params"]["conv"]["bias"]), 0)
    np.testing.assert_array_equal(np.asarray(out["params"]["bn"]["scale"]), 1)
    np.testing.assert_array_equal(np.asarray(out["params"]["bn"]["bias"]), 0)


def test_xavier_init_deterministic_across_processes():
    """Same seed → identical params in separate processes (different hash
    salts): per-leaf keys must come from a stable digest, not Python hash()."""
    import os
    import subprocess
    import sys

    from tests.conftest import REPO_ROOT

    prog = (
        # jax is PRE-IMPORTED at interpreter start in this environment, so the
        # JAX_PLATFORMS env var is never read; config.update post-import is
        # the only pin that works, and without it the child initializes the
        # tunneled TPU plugin — a wedged tunnel then hangs the child (and this
        # test) forever.  Same hermeticity rule as conftest/dryrun_multichip.
        "import numpy as np, jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from fdt.train.loops import xavier_init_variables\n"
        "v = {'params': {'a': {'kernel': np.ones((3,3,4,8), np.float32)},\n"
        "                'b': {'kernel': np.ones((1,1,8,8), np.float32)}}}\n"
        "out = xavier_init_variables(v, jax.random.PRNGKey(7))\n"
        "import zlib\n"
        "buf = b''.join(np.asarray(l).tobytes() for l in jax.tree.leaves(out))\n"
        "print(zlib.crc32(buf))\n"
    )

    def digest(seed_salt):
        env = dict(os.environ, PYTHONHASHSEED=seed_salt)
        r = subprocess.run([sys.executable, "-c", prog], capture_output=True,
                           text=True, env=env, cwd=str(REPO_ROOT),
                           timeout=600)
        assert r.returncode == 0, r.stderr
        return r.stdout.strip().splitlines()[-1]

    assert digest("1") == digest("2")


def test_abstract_init_matches_compiled_init(_tiny_trainer_base):
    """init_state(abstract=True) must produce bit-identical variables to the
    compiled Module.init + xavier path (it is what dryrun_multichip uses)."""
    trainer, host_state = _tiny_trainer_base
    fast = trainer.init_state(jax.random.PRNGKey(0), abstract=True)
    jax.tree.map(np.testing.assert_array_equal,
                 jax.device_get(fast.params), host_state.params)
    jax.tree.map(np.testing.assert_array_equal,
                 jax.device_get(fast.batch_stats), host_state.batch_stats)


@pytest.mark.slow
def test_eval_loss_jitted_and_fast(tiny_trainer, rng):
    """eval_loss must run as one jitted graph (MyTrain_mobile.py:211-230):
    the eager op-by-op dispatch it used to do was orders of magnitude slower
    than a train step at real input sizes.  Forward-only eval, warmed up,
    must beat the forward+backward train step; eager dispatch at 128² is
    ~100× slower, so a 3× bound separates the two regimes robustly."""
    import time

    trainer, state = tiny_trainer
    images, gb, gl, gv = make_batch(rng)

    # value parity with the eager loss path
    jitted = trainer.eval_loss(state, images, gb, gl, gv)
    eager = trainer._eval_loss(state.params, state.batch_stats, images,
                               gb, gl, gv)
    np.testing.assert_allclose(float(jitted), float(eager), rtol=1e-5)

    def best_of(fn, n=3):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # warm-up compiles (train_step donates state: keep the returned one)
    state_w, _ = trainer.train_step(state, images, gb, gl, gv, 1e-3)
    trainer.eval_loss(state_w, images, gb, gl, gv)

    t_eval = best_of(lambda: trainer.eval_loss(state_w, images, gb, gl, gv))
    # train_step mutates: time it via a fresh sacrificial copy each rep
    def one_train():
        nonlocal state_w
        state_w, m = trainer.train_step(state_w, images, gb, gl, gv, 1e-3)
        return m["loss"]
    t_train = best_of(one_train)
    assert t_eval < 3.0 * t_train, (
        f"eval_loss {t_eval:.3f}s vs train_step {t_train:.3f}s — eval path "
        f"looks eager")


def test_run_pyramid_training_loop(tmp_path):
    """End-to-end driver loop on a tiny synthetic dataset: prefetched
    batches, lazy LossHistory drain, checkpoint + 5-row loss dump layout."""
    import cv2

    from fdt.models.pyramidbox_mobile import build_pyramidbox
    from fdt.train.driver import TrainConfig, run_pyramid_training

    rng = np.random.RandomState(0)
    lines = []
    for i in range(3):
        img = (rng.rand(160, 200, 3) * 255).astype(np.uint8)
        path = tmp_path / f"im_{i}.jpg"
        cv2.imwrite(str(path), img)
        lines.append(f"{path} 1 40 30 80 90")
    anno = tmp_path / "anno.txt"
    anno.write_text("\n".join(lines) + "\n")

    model = build_pyramidbox("try3")
    trainer = PyramidTrainer(model, "try3", input_size=128)
    state = trainer.init_state(jax.random.PRNGKey(0), abstract=True)
    cfg = TrainConfig(batch_size=2, total_iters=4, save_point=2, max_gt=4,
                      save_folder=str(tmp_path), name="tiny",
                      eval_freq=2, eval_batches=1,
                      stall_timeout=60.0)   # watchdog-enabled path: starts,
                                            # beats on eval, closes cleanly
    state = run_pyramid_training(trainer, state, str(anno), cfg,
                                 val_anno=str(anno), log=lambda m: None)
    assert int(state.step) == 4
    loss2 = np.load(tmp_path / "tiny_loss_2.npy")
    assert loss2.shape[0] == 5                 # reference 5-row layout
    assert np.isfinite(loss2[:, :2]).all() and (loss2[0, :2] > 0).all()
    assert (tmp_path / "tiny_eval_loss_2.npy").exists()
    import os
    assert any("tiny" in f and "4" in f for f in os.listdir(tmp_path))


def test_prefetch_batches_shutdown():
    """Closing the prefetch generator must stop the worker thread — otherwise
    every finished training run leaks a daemon thread blocked in q.put,
    pinning the dataset and `depth` augmented batches for the process
    lifetime."""
    import threading
    import time

    from fdt.train.driver import prefetch_batches

    class TinyDataset:
        def __len__(self):
            return 8

        def batches(self, batch_size):
            while True:
                yield (np.zeros((batch_size, 8, 8, 3), np.float32),
                       [np.zeros((1, 5), np.float32)] * batch_size)

    before = {t.ident for t in threading.enumerate()}
    gen = prefetch_batches(TinyDataset(), 2, depth=2)
    next(gen)                      # worker running, queue filling
    worker = [t for t in threading.enumerate() if t.ident not in before]
    assert worker, "prefetch worker thread not found"
    gen.close()
    for _ in range(50):            # worker's put timeout is 0.2s
        if not any(t.is_alive() for t in worker):
            break
        time.sleep(0.1)
    assert not any(t.is_alive() for t in worker), \
        "prefetch worker still alive after close()"


@pytest.mark.slow
def test_bf16_mixed_precision_training(rng):
    """Mixed precision (model dtype=bf16, the scripts/train_pyramid.py --bf16
    path): flax params stay f32, the loss math runs f32 (loops.py upcasts the
    heads), the first-step loss agrees with the f32 trainer, and training
    makes progress."""
    from fdt.models.pyramidbox_mobile import build_pyramidbox

    batch = make_batch(rng)
    losses = {}
    for name, dt in (("f32", None), ("bf16", jnp.bfloat16)):
        trainer = PyramidTrainer(build_pyramidbox("try3", dtype=dt), "try3",
                                 input_size=128)
        state = trainer.init_state(jax.random.PRNGKey(0), abstract=True)
        if name == "bf16":
            assert all(leaf.dtype == jnp.float32
                       for leaf in jax.tree.leaves(state.params))
        seq = []
        for _ in range(3):
            state, m = trainer.train_step(state, *batch, 1e-3)
            seq.append(float(m["loss"]))
        losses[name] = seq
        if name == "bf16":  # params remain f32 after updates too
            assert all(leaf.dtype == jnp.float32
                       for leaf in jax.tree.leaves(state.params))
    assert np.isfinite(losses["bf16"]).all()
    # same init, same batch: the bf16 forward differs only by rounding
    assert abs(losses["bf16"][0] - losses["f32"][0]) \
        <= 0.05 * abs(losses["f32"][0])
    assert losses["bf16"][-1] < losses["bf16"][0]


@pytest.mark.slow
def test_remat_train_step_matches_plain(rng):
    """jax.checkpoint rematerialization (the scripts/train_pyramid.py --remat
    path on mobile variants) re-runs the same forward ops in the backward
    pass, so the loss and the updated parameters must match the plain trainer
    to float tolerance."""
    from fdt.models.pyramidbox_mobile import build_pyramidbox

    batch = make_batch(rng)
    states, metrics = {}, {}
    for name, remat in (("plain", False), ("remat", True)):
        trainer = PyramidTrainer(build_pyramidbox("try3"), "try3",
                                 input_size=128, remat=remat)
        state = trainer.init_state(jax.random.PRNGKey(0), abstract=True)
        states[name], metrics[name] = trainer.train_step(state, *batch, 1e-3)
    np.testing.assert_allclose(float(metrics["remat"]["loss"]),
                               float(metrics["plain"]["loss"]),
                               rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree.leaves(states["remat"].params),
                    jax.tree.leaves(states["plain"].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


@pytest.mark.slow
def test_remat_blocks_train_step_matches_plain(rng):
    """Segmented per-Bottleneck remat (PyramidBox(remat=True) — the flagship
    --remat path): identical params/batch_stats structure (nn.remat is
    structure-preserving, checkpoints interop) and matching loss/updates;
    mutable BN stats must flow through the lifted transform."""
    from fdt.models.pyramidbox import PyramidBox

    batch = make_batch(rng, b=1, size=64)
    states, metrics = {}, {}
    for name, remat in (("plain", False), ("blocks", True)):
        trainer = PyramidTrainer(PyramidBox(remat=remat), "repo",
                                 input_size=64)
        state = trainer.init_state(jax.random.PRNGKey(0), abstract=True)
        states[name], metrics[name] = trainer.train_step(state, *batch, 1e-3)
    assert (jax.tree.structure(states["blocks"].params)
            == jax.tree.structure(states["plain"].params))
    np.testing.assert_allclose(float(metrics["blocks"]["loss"]),
                               float(metrics["plain"]["loss"]),
                               rtol=1e-6, atol=1e-7)
    # the recomputed forward compiles into different fusions → ~1e-5-level
    # gradient drift (pure float noise; the loss above matches to 1e-6)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(states["blocks"].params),
            jax.tree_util.tree_leaves_with_path(states["plain"].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=1e-4,
                                   err_msg=jax.tree_util.keystr(pa))
    for a, b in zip(jax.tree.leaves(states["blocks"].batch_stats),
                    jax.tree.leaves(states["plain"].batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
