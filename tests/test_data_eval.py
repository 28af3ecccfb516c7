"""Tests for the annotation tooling and PR metric harness."""
import sys

import numpy as np
import pytest

from fdt.data.anno import generate_anno_file, parse_anno_file, validate_anno_file
from fdt.eval.pr import calc_pr, TfConfAccumulator, pr_curve, roc_curve


def test_parse_reference_val_anno(reference_root):
    path = reference_root / "image_and_anno/anno/gen_anno_file_val"
    recs = parse_anno_file(str(path))
    assert len(recs) == 3226
    assert recs[0].boxes_xywh.shape[1] == 4
    assert recs[0].boxes_xywh.dtype == np.int32


def test_generate_anno_matches_reference_output(reference_root, tmp_path):
    bbx = reference_root / "image_and_anno/anno/wider_face_val_bbx_gt.txt"
    out = tmp_path / "gen_anno_file_val"
    n = generate_anno_file(str(bbx), "IMGDIR/images_val", str(out))
    assert n == 3226
    ours = parse_anno_file(str(out))
    ref = parse_anno_file(str(reference_root / "image_and_anno/anno/gen_anno_file_val"))
    assert len(ours) == len(ref)
    for a, b in zip(ours[:50] + ours[-50:], ref[:50] + ref[-50:]):
        np.testing.assert_array_equal(a.boxes_xywh, b.boxes_xywh)
        # paths differ only by the configured image dir prefix
        assert a.path.split("images_val/")[-1] == b.path.split("images_val/")[-1]


def test_validate_anno_flags_degenerate_lines(tmp_path):
    p = tmp_path / "anno"
    p.write_text("a.jpg 1 1 2 3 4\n"
                 "b.jpg 1 0 0 0 0\n"          # all-zero first box → "100 error"
                 "c.jpg 2 1 2 3 4 5 6 7\n")   # truncated → "%4 error"
    msgs = validate_anno_file(str(p))
    assert msgs == ["100 error in line: 2", "%4 error in line: 3"]


def test_calc_pr_against_reference(reference_root, rng):
    sys.path.insert(0, str(reference_root))
    try:
        from utils.calc_performance import calc_pr as ref_calc_pr
    finally:
        sys.path.pop(0)
    truth = (rng.rand(6, 4) * 100 + 5).astype(np.int32)
    predict = np.hstack([rng.rand(11, 4) * 150, rng.rand(11, 1)]).astype(np.float64)
    want_tc, want_n = ref_calc_pr(predict, truth, iou_thresh=0.5)
    got_tc, got_n = calc_pr(predict, truth, iou_thresh=0.5)
    assert got_n == want_n
    np.testing.assert_allclose(got_tc, want_tc, rtol=1e-6)


def test_calc_pr_known_case():
    truth = np.array([[0, 0, 10, 10]], np.int32)           # xywh → [0,0,10,10]
    predict = np.array([[0, 0, 10, 10, 0.9],               # IoU 1 → tf
                        [6, 6, 16, 16, 0.8],               # IoU 16/184 → fp
                        [0, 0, 9, 10, 0.7]], np.float64)   # IoU 0.9 → tf
    tc, n = calc_pr(predict, truth)
    assert n == 1
    np.testing.assert_array_equal(tc[0], [1, 0, 1])
    np.testing.assert_allclose(tc[1], [0.9, 0.8, 0.7])


def test_accumulator_dump_layout():
    acc = TfConfAccumulator()
    truth = np.array([[0, 0, 10, 10]], np.int32)
    acc.add(np.array([[0, 0, 10, 10, 0.5]]), truth)
    acc.add(np.array([[100, 100, 110, 110, 0.9]]), truth)
    acc.add(np.empty((0, 5)), truth)  # empty prediction still counts GT
    dump = acc.finalize()
    assert dump.shape == (2, 3)
    np.testing.assert_allclose(dump[1], [0.9, 0.5, 3])  # sorted desc + gt count
    np.testing.assert_allclose(dump[0], [0, 1, 0])
    recall, precision = pr_curve(dump)
    np.testing.assert_allclose(recall, [0, 1 / 3])
    np.testing.assert_allclose(precision, [0, 0.5])
    fp, rec = roc_curve(dump)
    np.testing.assert_allclose(fp, [1, 1])


def test_merge_dumps_equals_single_process(rng):
    """8 contiguous process slices merged == one unsharded accumulation,
    bit-exact (the multi-host eval contract, fdt/eval/pr.py merge_dumps)."""
    from fdt.eval.pr import merge_dumps

    n_images = 37
    preds, truths = [], []
    for _ in range(n_images):
        n = rng.randint(0, 6)
        preds.append(np.column_stack([rng.rand(n, 2) * 50, 50 + rng.rand(n, 2) * 50,
                                      np.round(rng.rand(n, 1), 2)]))  # ties likely
        m = rng.randint(1, 4)
        truths.append(np.column_stack([rng.rand(m, 2) * 80,
                                       10 + rng.rand(m, 2) * 40]).astype(np.int32))

    single = TfConfAccumulator()
    for p, t in zip(preds, truths):
        single.add(p, t)
    want = single.finalize()

    n_proc = 8
    dumps = []
    for pi in range(n_proc):
        lo, hi = pi * n_images // n_proc, (pi + 1) * n_images // n_proc
        acc = TfConfAccumulator()
        for p, t in zip(preds[lo:hi], truths[lo:hi]):
            acc.add(p, t)
        dumps.append(acc.finalize())
    got = merge_dumps(dumps)
    np.testing.assert_array_equal(got, want)


def test_eval_collector_block_slices_cover(tmp_path):
    """Process block slices partition the record list exactly once."""
    from fdt.data import EvalCollector

    anno = tmp_path / "anno.txt"
    lines = [f"img_{i}.jpg 1 0 0 10 10" for i in range(11)]
    anno.write_text("\n".join(lines) + "\n")
    full = EvalCollector(str(anno))
    paths = [r.path for r in full.records]
    sliced = []
    for pi in range(4):
        c = EvalCollector(str(anno), process_index=pi, process_count=4)
        sliced += [r.path for r in c.records]
    assert sliced == paths


def test_merge_raw_bit_exact_with_ties(rng):
    """merge_raw reproduces the unsharded dump bit-exactly even when
    confidences tie across shards (merge_dumps only guarantees value
    identity there)."""
    from fdt.eval.pr import TfConfAccumulator, merge_raw

    preds, truths = [], []
    for i in range(12):
        n = rng.randint(1, 6)
        boxes = rng.rand(n, 4) * 50
        boxes[:, 2:] += boxes[:, :2] + 5
        conf = np.round(rng.rand(n), 1)       # heavy ties by construction
        preds.append(np.column_stack([boxes, conf]))
        truths.append((rng.rand(rng.randint(0, 4), 4) * 50 + 1).astype(np.float64))

    single = TfConfAccumulator()
    for p, t in zip(preds, truths):
        single.add(p, t)
    want = single.finalize()

    parts = []
    for pi in range(3):
        acc = TfConfAccumulator()
        for p, t in zip(preds[pi * 4:(pi + 1) * 4], truths[pi * 4:(pi + 1) * 4]):
            acc.add(p, t)
        parts.append(acc.raw())
    got = merge_raw(parts)
    np.testing.assert_array_equal(got, want)


def test_calc_pr_zero_truth():
    """An image with detections but no GT counts them all as false
    positives instead of crashing (the reference would np.max over an
    empty axis)."""
    from fdt.eval.pr import TfConfAccumulator, calc_pr

    pred = np.array([[0, 0, 10, 10, 0.9], [5, 5, 20, 20, 0.7]])
    tf_conf, n = calc_pr(pred, np.zeros((0, 4)))
    assert n == 0
    np.testing.assert_array_equal(tf_conf[0], [0, 0])
    acc = TfConfAccumulator()
    acc.add(pred, np.zeros((0, 4)))
    dump = acc.finalize()
    assert dump.shape == (2, 3) and dump[1, -1] == 0
