"""Pallas NMS kernel vs the numpy greedy oracle (interpreter mode on CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from fdt.ops.pallas_nms import pallas_nms_keep
from tests.test_geometry import np_greedy_nms


@pytest.mark.parametrize("mode", ["union", "minimum"])
@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_nms_matches_oracle(mode, seed):
    rng = np.random.RandomState(seed)
    n = 200
    centers = rng.rand(n, 2) * 4
    wh = rng.rand(n, 2) * 2 + 0.5
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], 1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    order = np.argsort(-scores, kind="stable")
    sorted_boxes = boxes[order]

    want_keep_sorted = np.zeros(n, bool)
    keep_orig = np_greedy_nms(boxes, scores, 0.5, mode)
    inv = np.argsort(order)
    want_keep_sorted[inv[keep_orig]] = True

    got = np.asarray(pallas_nms_keep(jnp.asarray(sorted_boxes),
                                     jnp.ones(n, bool), 0.5, mode=mode,
                                     interpret=True))
    np.testing.assert_array_equal(got, want_keep_sorted)


def test_pallas_nms_respects_valid():
    boxes = jnp.asarray(np.array([[0, 0, 1, 1], [0, 0, 1, 1]], np.float32))
    got = np.asarray(pallas_nms_keep(boxes, jnp.array([False, True]), 0.5,
                                     interpret=True))
    np.testing.assert_array_equal(got, [False, True])


@pytest.mark.parametrize("mode", ["union", "minimum"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_nms_tiled_matches_oracle(mode, seed):
    from fdt.ops.pallas_nms import pallas_nms_keep_tiled

    rng = np.random.RandomState(seed)
    n = 300  # > 2 tiles, non-multiple of 128 (exercises padding)
    centers = rng.rand(n, 2) * 4
    wh = rng.rand(n, 2) * 2 + 0.5
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], 1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    order = np.argsort(-scores, kind="stable")
    sorted_boxes = boxes[order]

    want_keep_sorted = np.zeros(n, bool)
    keep_orig = np_greedy_nms(boxes, scores, 0.5, mode)
    inv = np.argsort(order)
    want_keep_sorted[inv[keep_orig]] = True

    got = np.asarray(pallas_nms_keep_tiled(jnp.asarray(sorted_boxes),
                                           jnp.ones(n, bool), 0.5, mode=mode,
                                           interpret=True))
    np.testing.assert_array_equal(got, want_keep_sorted)


def test_pallas_nms_tiled_respects_valid():
    from fdt.ops.pallas_nms import pallas_nms_keep_tiled

    boxes = jnp.asarray(np.array([[0, 0, 1, 1], [0, 0, 1, 1]], np.float32))
    got = np.asarray(pallas_nms_keep_tiled(boxes, jnp.array([False, True]), 0.5,
                                           interpret=True))
    np.testing.assert_array_equal(got, [False, True])


@pytest.mark.parametrize("out_k", [16, 100, 750])
def test_pallas_nms_tiled_out_k_prefix_exact(out_k):
    """out_k early exit: the first out_k keeps (and everything a first-out_k
    consumer like nms_padded observes) must be identical to the uncapped
    kernel, on a DENSE scene where nearly every box is kept (the case that
    triggers the exit well before the active extent)."""
    from fdt.ops.pallas_nms import pallas_nms_keep_tiled

    rng = np.random.RandomState(7)
    n = 1500
    centers = rng.rand(n, 2) * 100          # spread out: most boxes survive
    wh = rng.rand(n, 2) * 2 + 0.5
    boxes = jnp.asarray(np.concatenate([centers - wh / 2, centers + wh / 2],
                                       1).astype(np.float32))
    valid = jnp.ones(n, bool)
    full = np.asarray(pallas_nms_keep_tiled(boxes, valid, 0.5, interpret=True))
    capped = np.asarray(pallas_nms_keep_tiled(boxes, valid, 0.5,
                                              interpret=True, out_k=out_k))
    # prefix property: identical up to and including the out_k-th keep
    full_idx = np.flatnonzero(full)
    capped_idx = np.flatnonzero(capped)
    assert len(capped_idx) >= min(out_k, len(full_idx))
    m = min(out_k, len(full_idx))
    np.testing.assert_array_equal(capped_idx[:m], full_idx[:m])
    # nothing kept that the uncapped kernel would not keep
    assert not np.any(capped & ~full)


def test_nms_padded_out_k_impls_agree():
    """nms_padded output (keep_idx[:count], count) is bit-identical between
    the XLA fixpoint and the out_k-capped tiled kernel on a dense scene."""
    import jax
    from fdt.geometry.nms import nms_padded

    rng = np.random.RandomState(3)
    n, out_k = 2048, 128
    centers = rng.rand(n, 2) * 50
    wh = rng.rand(n, 2) * 3 + 0.5
    boxes = jnp.asarray(np.concatenate([centers - wh / 2, centers + wh / 2],
                                       1).astype(np.float32))
    scores = jnp.asarray(rng.rand(n).astype(np.float32))
    ix, cx = nms_padded(boxes, scores, 0.45, budget=n, out_k=out_k, impl="xla")
    # interpret-mode Pallas via the public entry: monkey-free direct call
    from fdt.ops.pallas_nms import pallas_nms_keep_tiled
    top_scores, order = jax.lax.top_k(scores, n)
    keep = pallas_nms_keep_tiled(boxes[order], top_scores > -jnp.inf, 0.45,
                                 interpret=True, out_k=out_k)
    comp = jnp.argsort(~keep, stable=True)
    count = jnp.minimum(jnp.sum(keep), out_k).astype(jnp.int32)
    idx = order[comp[:out_k]]
    assert int(count) == int(cx)
    np.testing.assert_array_equal(np.asarray(idx)[: int(count)],
                                  np.asarray(ix)[: int(cx)])


@pytest.mark.parametrize("mode", ["union", "minimum"])
@pytest.mark.parametrize("n", [300, 4500])
def test_pallas_nms_tiled_segmented(mode, n):
    """seg_id: suppression confined to segments, matching nms_keep_mask —
    the MTCNN per-level NMS path (detect.py:314)."""
    from fdt.geometry.nms import nms_keep_mask
    from fdt.ops.pallas_nms import pallas_nms_keep_tiled

    rng = np.random.RandomState(3)
    centers = rng.rand(n, 2) * 6
    wh = rng.rand(n, 2) * 2 + 0.5
    boxes = jnp.asarray(np.concatenate([centers - wh / 2, centers + wh / 2],
                                       1).astype(np.float32))
    valid = jnp.asarray(rng.rand(n) > 0.1)
    seg = jnp.asarray((rng.rand(n) * 7).astype(np.int32))
    want = np.asarray(nms_keep_mask(boxes, valid, 0.4, mode=mode, seg_id=seg))
    got = np.asarray(pallas_nms_keep_tiled(boxes, valid, 0.4, mode=mode,
                                           seg_id=seg, interpret=True))
    np.testing.assert_array_equal(got, want)
