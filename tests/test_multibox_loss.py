"""MultiBox loss parity vs the torch reference implementation."""
import numpy as np
import jax.numpy as jnp
import pytest

from fdt.train.multibox_loss import MultiBoxLossConfig, multibox_loss
from fdt.train.loops import pad_targets
from tests.conftest import import_reference


def make_case(rng, b=3, p=120, gmax=6):
    priors = np.concatenate([rng.rand(p, 2),
                             rng.rand(p, 2) * 0.3 + 0.05], 1).astype(np.float32)
    loc = rng.randn(b, p, 4).astype(np.float32)
    conf = rng.randn(b, p, 2).astype(np.float32)
    targets = []
    for i in range(b):
        g = rng.randint(1, gmax)
        xy = rng.rand(g, 2) * 0.6
        wh = rng.rand(g, 2) * 0.3 + 0.05
        t = np.concatenate([xy, xy + wh, np.zeros((g, 1))], 1).astype(np.float32)
        targets.append(t)
    return priors, loc, conf, targets


@pytest.mark.parametrize("bipartite", [False, True])
def test_multibox_loss_matches_reference(reference_root, bipartite):
    torch = pytest.importorskip("torch")
    mbl = import_reference("layers.modules.multibox_loss")

    rng = np.random.RandomState(42)
    priors, loc, conf, targets = make_case(rng)

    criterion = mbl.MultiBoxLoss(num_classes=2, overlap_thresh=0.35,
                                 prior_for_matching=True, bkg_label=0,
                                 neg_mining=True, neg_pos=3, neg_overlap=0.35,
                                 encode_target=False, bipartite=bipartite,
                                 use_gpu=False)
    want_l, want_c = criterion(
        (torch.from_numpy(loc), torch.from_numpy(conf), torch.from_numpy(priors)),
        [torch.from_numpy(t) for t in targets])

    gt_boxes, gt_labels, gt_valid = pad_targets(targets, max_gt=8)
    cfg = MultiBoxLossConfig(bipartite=bipartite)
    got_l, got_c = multibox_loss(jnp.asarray(loc), jnp.asarray(conf),
                                 jnp.asarray(priors), jnp.asarray(gt_boxes),
                                 jnp.asarray(gt_labels), jnp.asarray(gt_valid), cfg)
    np.testing.assert_allclose(float(got_l), float(want_l), rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(float(got_c), float(want_c), rtol=2e-3, atol=1e-4)


def test_multibox_loss_no_positives():
    # GT far outside every prior's reach → no positives → loss_c = 10/1
    p = 16
    priors = np.tile(np.array([[0.1, 0.1, 0.05, 0.05]], np.float32), (p, 1))
    loc = np.zeros((1, p, 4), np.float32)
    conf = np.zeros((1, p, 2), np.float32)
    gt_boxes = np.array([[[0.8, 0.8, 0.9, 0.9]]], np.float32)
    gt_labels = np.zeros((1, 1), np.int32)
    gt_valid = np.ones((1, 1), bool)
    l, c = multibox_loss(jnp.asarray(loc), jnp.asarray(conf), jnp.asarray(priors),
                         jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
                         jnp.asarray(gt_valid), MultiBoxLossConfig())
    assert float(l) == 0.0
    assert float(c) == 10.0


def test_multibox_loss_gradients_finite(rng):
    import jax
    priors, loc, conf, targets = make_case(rng, b=2, p=60)
    gt_boxes, gt_labels, gt_valid = pad_targets(targets, max_gt=8)

    def f(loc, conf):
        l, c = multibox_loss(loc, conf, jnp.asarray(priors),
                             jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
                             jnp.asarray(gt_valid), MultiBoxLossConfig())
        return l + c

    gl, gc = jax.grad(f, argnums=(0, 1))(jnp.asarray(loc), jnp.asarray(conf))
    assert np.all(np.isfinite(np.asarray(gl)))
    assert np.all(np.isfinite(np.asarray(gc)))
    assert float(jnp.abs(gl).sum()) > 0
