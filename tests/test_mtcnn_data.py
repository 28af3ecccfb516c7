"""Direct tests for the MTCNN stage-data factories (fdt/data/mtcnn_data.py)
vs the reference semantics (gen_Pnet_train_data.py:51-169,
gen_Rnet_train_data.py:94-229, gen_landmark_48.py, assemble.py:28-34).

Each factory exposes an on_patch(kind, crop_box, offsets) observer, so the
tests verify IoU-bucket membership and offset-label inversion on every emitted
patch without replaying the sampling loops.
"""
import os

import numpy as np
import pytest

from fdt.data.mtcnn_data import (GenStats, _iou_one_to_many,
                                 assemble_annotations, gen_hard_example_data,
                                 gen_landmark_data, gen_pnet_train_data)

cv2 = pytest.importorskip("cv2")


@pytest.fixture()
def synth_scene(tmp_path):
    """One 320×240 textured image with a single 60×50 GT face box."""
    rng = np.random.RandomState(5)
    img = (rng.rand(240, 320, 3) * 255).astype(np.uint8)
    gt = np.array([100, 80, 159, 129])  # x1 y1 x2 y2 (w=60, h=50 inclusive)
    path = tmp_path / "scene.jpg"
    cv2.imwrite(str(path), img)
    anno = tmp_path / "anno.txt"
    anno.write_text(f"scene.jpg {gt[0]} {gt[1]} {gt[2]} {gt[3]}\n")
    return str(anno), str(tmp_path), gt


def test_gen_pnet_buckets_and_offsets(synth_scene, tmp_path):
    anno, prefix, gt = synth_scene
    seen = []
    st = gen_pnet_train_data(anno, prefix, str(tmp_path / "out"),
                             rng=np.random.RandomState(0), neg_per_image=30,
                             on_patch=lambda k, c, o: seen.append((k, np.array(c, float), o)))
    assert st.pos > 0 and st.neg >= 30 and st.part > 0
    assert len(seen) == st.pos + st.neg + st.part

    for kind, crop, off in seen:
        iou = float(_iou_one_to_many(crop, gt[None].astype(float))[0])
        if kind == "neg":
            assert iou < 0.3 and off is None
        else:
            size = crop[2] - crop[0]
            # offset-label inversion: crop + off·size reconstructs the GT
            # corners exactly (gen_Pnet_train_data.py:124-127 labels)
            rec = crop + np.array(off) * size
            np.testing.assert_allclose(rec, gt.astype(float), atol=1e-6)
            if kind == "pos":
                assert iou >= 0.65
            else:
                assert 0.4 <= iou < 0.65

    # emitted anno lines match the stats and reference label codes
    anno_dir = tmp_path / "out" / "anno_store"
    pos_lines = open(anno_dir / "pos_12.txt").readlines()
    neg_lines = open(anno_dir / "neg_12.txt").readlines()
    part_lines = open(anno_dir / "part_12.txt").readlines()
    assert (len(pos_lines), len(neg_lines), len(part_lines)) == (st.pos, st.neg, st.part)
    assert all(l.split()[1] == "1" and len(l.split()) == 6 for l in pos_lines)
    assert all(l.split()[1] == "0" and len(l.split()) == 2 for l in neg_lines)
    assert all(l.split()[1] == "-1" for l in part_lines)
    # every saved patch is a 12² image
    p0 = cv2.imread(pos_lines[0].split()[0])
    assert p0.shape == (12, 12, 3)


def test_gen_hard_example_buckets_and_offsets(synth_scene, tmp_path):
    anno, prefix, gt = synth_scene

    def fake_detector(img):
        """Previous-stage stand-in: squares spanning every IoU bucket plus
        more low-IoU boxes than the neg cap allows."""
        rows = [[105, 70, 160, 125, 0.9],    # high IoU after squaring → pos
                [110, 70, 175, 135, 0.8],    # mid IoU after squaring → part
                [110, 60, 180, 130, 0.7]]    # part
        for i in range(8):                   # far → negatives (cap at 5)
            rows.append([10 + 14 * i, 150 + 4 * i, 50 + 14 * i, 190 + 4 * i, 0.5])
        return np.array(rows, np.float32)

    seen = []
    st = gen_hard_example_data(fake_detector, anno, prefix,
                               str(tmp_path / "out24"), image_size=24,
                               neg_cap_per_image=5,
                               on_patch=lambda k, c, o: seen.append((k, np.array(c, float), o)))
    assert st.pos > 0 and st.part > 0 and st.neg > 0
    assert st.neg <= 5                       # per-image negative cap respected
    for kind, box, off in seen:
        iou = float(_iou_one_to_many(box, gt[None].astype(float))[0])
        if kind == "neg":
            assert iou < 0.3 and off is None
        else:
            w = box[2] - box[0] + 1.0        # inclusive extents (detect.py crops)
            h = box[3] - box[1] + 1.0
            rec = box + np.array(off) * np.array([w, h, w, h])
            np.testing.assert_allclose(rec, gt.astype(float), atol=1e-6)
            assert (iou >= 0.65) if kind == "pos" else (0.4 <= iou < 0.65)
    p = cv2.imread(os.path.join(str(tmp_path / "out24"), "24/positive/0.jpg"))
    assert p.shape == (24, 24, 3)


def test_gen_landmark_roundtrip(tmp_path):
    rng = np.random.RandomState(2)
    img = (rng.rand(200, 200, 3) * 255).astype(np.uint8)
    cv2.imwrite(str(tmp_path / "face.jpg"), img)
    x1, x2, y1, y2 = 40.0, 139.0, 30.0, 149.0
    lm = np.array([[60, 70], [110, 72], [85, 95], [65, 120], [105, 122]], float)
    anno = tmp_path / "lm_anno.txt"
    anno.write_text(f"face.jpg {x1} {x2} {y1} {y2} "
                    + " ".join(f"{v}" for p in lm for v in p) + "\n")

    n = gen_landmark_data(str(anno), str(tmp_path), str(tmp_path / "out48"),
                          image_size=48)
    assert n == 1
    line = open(tmp_path / "out48" / "anno_store" / "landmark_48.txt").read().split()
    assert line[1] == "-2" and line[2:6] == ["0", "0", "0", "0"]
    norm = np.array(line[6:16], float).reshape(5, 2)
    # normalization round-trip: norm·(w,h) + (x1,y1) reconstructs the points
    w, h = x2 - x1 + 1, y2 - y1 + 1
    rec = norm * [w, h] + [x1, y1]
    np.testing.assert_allclose(rec, lm, atol=1e-2)  # %.4f file rounding
    patch = cv2.imread(line[0])
    assert patch.shape == (48, 48, 3)


def test_assemble_cap_and_sources(tmp_path):
    a = tmp_path / "a.txt"
    b = tmp_path / "b.txt"
    a.write_text("".join(f"a{i}\n" for i in range(10)))
    b.write_text("".join(f"b{i}\n" for i in range(100)))
    out = tmp_path / "merged.txt"
    n = assemble_annotations(str(out), [str(a), str(b)],
                             rng=np.random.RandomState(0), base_num=10)
    lines = open(out).readlines()
    # per-list cap = 3·base_num, sampled WITH replacement (assemble.py:28-34)
    assert n == len(lines) == 10 + 30
    assert all(l[0] in "ab" for l in lines)
    assert sum(l.startswith("a") for l in lines) == 10
    # rerun truncates instead of appending
    n2 = assemble_annotations(str(out), [str(a)],
                              rng=np.random.RandomState(0), base_num=10)
    assert n2 == len(open(out).readlines()) == 10
