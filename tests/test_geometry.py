"""Golden unit tests for fdt.geometry against hand-computed cases and numpy oracles.

The numpy oracles re-derive the reference formulas (layers/box_utils.py,
FACEBOX/encoderl.py, MTCNN/mtcnn/core/utils.py) independently so that our JAX
implementations are checked against a second implementation, not themselves.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from fdt.geometry import (
    point_form, center_size, iou_matrix, pair_distance, encode, decode,
    nms_padded, nms_keep_mask, match_default, match_ensure_max_prior,
)


def rand_boxes(rng, n, scale=1.0):
    """Random well-formed point-form boxes."""
    xy = rng.rand(n, 2) * scale
    wh = rng.rand(n, 2) * 0.5 * scale + 1e-3
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


# ---------------------------------------------------------------- conversions

def test_point_center_roundtrip(rng):
    b = rand_boxes(rng, 64)
    out = np.asarray(point_form(center_size(jnp.asarray(b))))
    np.testing.assert_allclose(out, b, rtol=1e-6, atol=1e-6)


def test_point_form_known():
    cs = jnp.array([[0.5, 0.5, 0.2, 0.4]])
    np.testing.assert_allclose(np.asarray(point_form(cs))[0], [0.4, 0.3, 0.6, 0.7],
                               rtol=0, atol=1e-7)


# ------------------------------------------------------------------------ IoU

def np_iou(a, b):
    inter_w = np.maximum(0, np.minimum(a[:, None, 2], b[None, :, 2]) -
                         np.maximum(a[:, None, 0], b[None, :, 0]))
    inter_h = np.maximum(0, np.minimum(a[:, None, 3], b[None, :, 3]) -
                         np.maximum(a[:, None, 1], b[None, :, 1]))
    inter = inter_w * inter_h
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / (area_a[:, None] + area_b[None, :] - inter)


def test_iou_matches_numpy_oracle(rng):
    a, b = rand_boxes(rng, 37), rand_boxes(rng, 53)
    np.testing.assert_allclose(np.asarray(iou_matrix(jnp.asarray(a), jnp.asarray(b))),
                               np_iou(a, b), rtol=1e-5, atol=1e-6)


def test_iou_known_values():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.array([[5.0, 0.0, 15.0, 10.0],   # half overlap: 50/(100+100-50)
                   [0.0, 0.0, 10.0, 10.0],   # identical
                   [20.0, 20.0, 30.0, 30.0]])  # disjoint
    got = np.asarray(iou_matrix(a, b))[0]
    np.testing.assert_allclose(got, [50 / 150, 1.0, 0.0], rtol=1e-6, atol=1e-7)


def test_pair_distance_matches_reference_formula(rng):
    # independent re-derivation of utils/calc_performance.py:34-51
    a, b = rand_boxes(rng, 5, 100), rand_boxes(rng, 7, 100)
    a_sz = a[:, None, 2:] - a[:, None, :2]
    b_sz = b[None, :, 2:] - b[None, :, :2]
    d_xy = (b[None, :, 2:] + b[None, :, :2]) / 2 - (a[:, None, 2:] + a[:, None, :2]) / 2
    d_sz = a_sz - b_sz
    d_z = (d_sz[..., 0] + d_sz[..., 1]) / 2
    want = (d_z**2 + d_xy[..., 0]**2 + d_xy[..., 1]**2) ** 0.25
    got = np.asarray(pair_distance(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# -------------------------------------------------------------- encode/decode

def test_encode_decode_roundtrip(rng):
    priors_cs = np.concatenate([rng.rand(40, 2), rng.rand(40, 2) * 0.3 + 0.05],
                               axis=1).astype(np.float32)
    gt = rand_boxes(rng, 40, 0.8)
    variances = (0.1, 0.2)
    loc = encode(jnp.asarray(gt), jnp.asarray(priors_cs), variances)
    back = np.asarray(decode(loc, jnp.asarray(priors_cs), variances))
    np.testing.assert_allclose(back, gt, rtol=1e-4, atol=1e-5)


def test_encode_known_value():
    # prior exactly on the GT: offsets are zero
    gt = jnp.array([[0.4, 0.3, 0.6, 0.7]])
    prior = jnp.array([[0.5, 0.5, 0.2, 0.4]])
    loc = np.asarray(encode(gt, prior, (0.1, 0.2)))
    np.testing.assert_allclose(loc, np.zeros((1, 4)), atol=1e-6)


def test_decode_against_reference_torch(reference_root, rng):
    torch = pytest.importorskip("torch")
    from tests.conftest import import_reference
    ref_bu = import_reference("layers.box_utils")
    loc = rng.randn(100, 4).astype(np.float32)
    priors = np.concatenate([rng.rand(100, 2), rng.rand(100, 2) * 0.3 + 0.05],
                            axis=1).astype(np.float32)
    want = ref_bu.decode(torch.from_numpy(loc), torch.from_numpy(priors), [0.1, 0.2]).numpy()
    got = np.asarray(decode(jnp.asarray(loc), jnp.asarray(priors), (0.1, 0.2)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


# ------------------------------------------------------------------------ NMS

def np_greedy_nms(boxes, scores, thresh, mode="union"):
    """Independent oracle replicating encoderl.py:217-266 greedy semantics."""
    x1, y1, x2, y2 = boxes.T
    areas = (x2 - x1) * (y2 - y1)
    order = np.argsort(-scores, kind="stable")
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        inter = np.maximum(0.0, xx2 - xx1) * np.maximum(0.0, yy2 - yy1)
        if mode == "union":
            ovr = inter / (areas[i] + areas[order[1:]] - inter)
        else:
            ovr = inter / np.minimum(areas[i], areas[order[1:]])
        order = order[1:][ovr < thresh]
    return keep


@pytest.mark.parametrize("mode", ["union", "minimum"])
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_nms_matches_greedy_oracle(mode, seed):
    rng = np.random.RandomState(seed)
    n = 200
    # clustered boxes so suppression chains actually occur
    centers = rng.rand(n, 2) * 4
    wh = rng.rand(n, 2) * 2 + 0.5
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], 1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    want = np_greedy_nms(boxes, scores, 0.5, mode)
    idx, count = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                            budget=n, out_k=n, mode=mode)
    got = np.asarray(idx)[: int(count)]
    np.testing.assert_array_equal(got, np.array(want))


def test_nms_budget_and_out_k():
    boxes = jnp.asarray(np.array([[0, 0, 1, 1], [10, 10, 11, 11],
                                  [20, 20, 21, 21], [0.01, 0, 1.01, 1]], np.float32))
    scores = jnp.asarray(np.array([0.9, 0.8, 0.7, 0.95], np.float32))
    idx, count = nms_padded(boxes, scores, 0.5, budget=4, out_k=2)
    # box 3 wins, suppresses box 0; then box 1
    assert int(count) == 2
    np.testing.assert_array_equal(np.asarray(idx[:2]), [3, 1])


def test_nms_keep_mask_respects_valid():
    boxes = jnp.asarray(np.array([[0, 0, 1, 1], [0, 0, 1, 1]], np.float32))
    keep = nms_keep_mask(boxes, jnp.array([False, True]), 0.5)
    np.testing.assert_array_equal(np.asarray(keep), [False, True])


def test_nms_all_invalid():
    boxes = jnp.zeros((8, 4), jnp.float32)
    scores = jnp.full((8,), -jnp.inf)
    idx, count = nms_padded(boxes, scores, 0.5, budget=8, out_k=8)
    assert int(count) == 0


# -------------------------------------------------------------------- matching

def np_match_default(threshold, gt, labels, priors_cs, variances):
    """Oracle for layers/box_utils.py:165-210."""
    pf = np.concatenate([priors_cs[:, :2] - priors_cs[:, 2:] / 2,
                         priors_cs[:, :2] + priors_cs[:, 2:] / 2], 1)
    overlaps = np_iou(gt, pf)
    best_truth_overlap = overlaps.max(0)
    best_truth_idx = overlaps.argmax(0)
    matches = gt[best_truth_idx]
    conf = labels[best_truth_idx] + 1
    conf[best_truth_overlap < threshold] = 0
    g_cxcy = ((matches[:, :2] + matches[:, 2:]) / 2 - priors_cs[:, :2]) / (variances[0] * priors_cs[:, 2:])
    g_wh = np.log((matches[:, 2:] - matches[:, :2]) / priors_cs[:, 2:]) / variances[1]
    return np.concatenate([g_cxcy, g_wh], 1), conf


def test_match_default_against_oracle(rng):
    g, p = 7, 120
    gt = rand_boxes(rng, g, 0.9)
    labels = np.zeros(g, np.int64)
    priors = np.concatenate([rng.rand(p, 2), rng.rand(p, 2) * 0.3 + 0.02], 1).astype(np.float32)
    want_loc, want_conf = np_match_default(0.35, gt, labels, priors, (0.1, 0.2))
    # pad GT to 16
    pad = 16 - g
    gt_p = np.concatenate([gt, np.zeros((pad, 4), np.float32)])
    lab_p = np.concatenate([labels, np.zeros(pad, np.int64)])
    valid = np.concatenate([np.ones(g, bool), np.zeros(pad, bool)])
    loc, conf = match_default(0.35, jnp.asarray(gt_p), jnp.asarray(lab_p),
                              jnp.asarray(valid), jnp.asarray(priors), (0.1, 0.2))
    np.testing.assert_array_equal(np.asarray(conf), want_conf)
    mask = want_conf > 0
    # XLA's f32 log differs from numpy's by a few ulp-equivalents
    np.testing.assert_allclose(np.asarray(loc)[mask], want_loc[mask], rtol=1e-3, atol=1e-3)


def test_match_ensure_max_prior_forces_best(rng):
    # One tiny GT box below threshold for every prior: bipartite still assigns it.
    gt = np.array([[0.41, 0.41, 0.44, 0.44]], np.float32)
    labels = np.zeros(1, np.int64)
    valid = np.ones(1, bool)
    priors = np.array([[0.5, 0.5, 0.4, 0.4], [0.2, 0.2, 0.2, 0.2]], np.float32)
    _, conf_def = match_default(0.35, jnp.asarray(gt), jnp.asarray(labels),
                                jnp.asarray(valid), jnp.asarray(priors), (0.1, 0.2))
    _, conf_bip = match_ensure_max_prior(0.35, jnp.asarray(gt), jnp.asarray(labels),
                                         jnp.asarray(valid), jnp.asarray(priors), (0.1, 0.2))
    assert int(np.asarray(conf_def).sum()) == 0
    np.testing.assert_array_equal(np.asarray(conf_bip), [1, 0])


def test_match_no_valid_gt():
    priors = jnp.asarray(np.array([[0.5, 0.5, 0.4, 0.4]], np.float32))
    gt = jnp.zeros((4, 4))
    labels = jnp.zeros((4,), jnp.int32)
    valid = jnp.zeros((4,), bool)
    loc, conf = match_default(0.35, gt, labels, valid, priors, (0.1, 0.2))
    assert int(np.asarray(conf).sum()) == 0
    assert np.all(np.isfinite(np.asarray(loc)))
