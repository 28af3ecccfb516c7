"""MTCNN training losses vs the torch reference LossFn + one-step smoke tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fdt.train.mtcnn_train import (MTCNNStageTrainer, box_loss, cls_loss,
                                   compute_accuracy, landmark_loss)
from fdt.data.mtcnn_data import append_flipped_images, parse_mtcnn_imdb
from tests.conftest import import_reference


def make_labels(rng, n=32):
    # mix of pos(1) neg(0) part(-1) landmark(-2)
    label = rng.choice([1, 0, -1, -2], size=n).astype(np.float32)
    prob = rng.rand(n, 1).astype(np.float32) * 0.98 + 0.01
    bbox = rng.randn(n, 4).astype(np.float32)
    pred_box = rng.randn(n, 4).astype(np.float32)
    lm = rng.randn(n, 10).astype(np.float32)
    pred_lm = rng.randn(n, 10).astype(np.float32)
    return label, prob, bbox, pred_box, lm, pred_lm


def test_losses_match_reference(rng):
    torch = pytest.importorskip("torch")
    models = import_reference("MTCNN.mtcnn.core.models")
    lossfn = models.LossFn()
    label, prob, bbox, pred_box, lm, pred_lm = make_labels(rng)
    t = torch.from_numpy

    want_cls = float(lossfn.cls_loss(t(label), t(prob)))
    want_box = float(lossfn.box_loss(t(label), t(bbox), t(pred_box)))
    want_lm = float(lossfn.landmark_loss(t(label), t(lm), t(pred_lm)))

    got_cls = float(cls_loss(jnp.asarray(label), jnp.asarray(prob)))
    got_box = float(box_loss(jnp.asarray(label), jnp.asarray(bbox), jnp.asarray(pred_box)))
    got_lm = float(landmark_loss(jnp.asarray(label), jnp.asarray(lm), jnp.asarray(pred_lm)))
    np.testing.assert_allclose(got_cls, want_cls, rtol=1e-4)
    np.testing.assert_allclose(got_box, want_box, rtol=1e-4)
    np.testing.assert_allclose(got_lm, want_lm, rtol=1e-4)

    # accuracy: same masked-threshold formula as train.py:11-27
    got_acc = float(compute_accuracy(jnp.asarray(prob), jnp.asarray(label)))
    mask = label >= 0
    ones = (prob.reshape(-1)[mask] >= 0.6).astype(np.float32)
    want_acc = float((ones == label[mask]).mean())
    np.testing.assert_allclose(got_acc, want_acc, rtol=1e-5)


@pytest.mark.parametrize("stage", ["pnet", "rnet", "onet"])
def test_stage_train_step_smoke(stage, rng):
    trainer = MTCNNStageTrainer(stage)
    state = trainer.init_state(jax.random.PRNGKey(0))
    b, s = 8, trainer.size
    ims = (rng.rand(b, s, s, 3) * 255).astype(np.uint8)
    label = rng.choice([1, 0, -1, -2], size=b).astype(np.float32)
    bbox = rng.randn(b, 4).astype(np.float32)
    lm = rng.randn(b, 10).astype(np.float32)
    state, m = trainer.train_step(state, ims, label, bbox, lm)
    assert np.isfinite(float(m["loss"]))
    state, m2 = trainer.train_step(state, ims, label, bbox, lm)
    assert float(m2["loss"]) != float(m["loss"])  # params actually updated


def test_imdb_parsing_and_flip(tmp_path):
    anno = tmp_path / "anno.txt"
    anno.write_text("a.jpg 1 0.1 0.2 0.3 0.4\n"
                    "b.jpg 0\n"
                    "c.jpg -2 0 0 0 0 0.1 0.2 0.3 0.4 0.5 0.6 0.7 0.8 0.9 1.0\n")
    imdb = parse_mtcnn_imdb(str(anno))
    assert [r["label"] for r in imdb] == [1, 0, -2]
    np.testing.assert_allclose(imdb[0]["bbox_target"], [0.1, 0.2, 0.3, 0.4])
    assert imdb[2]["landmark_target"][0] == 0.1
    flipped = append_flipped_images(imdb)
    assert len(flipped) == 6
    # bbox x-offsets negate and swap (imagedb.py:139-140)
    np.testing.assert_allclose(flipped[3]["bbox_target"], [-0.3, 0.2, -0.1, 0.4])
    # landmark x→1-x with eye swap (imagedb.py:142-146)
    lm = flipped[5]["landmark_target"].reshape(5, 2)
    np.testing.assert_allclose(lm[0], [1 - 0.3, 0.4])  # right eye ← left eye
    np.testing.assert_allclose(lm[1], [1 - 0.1, 0.2])
