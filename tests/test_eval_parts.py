"""Multi-process eval through part files (runner plumbing + merge CLI).

Library-level merge_raw parity is pinned in test_data_eval.py; this covers
the front-door plumbing added for multi-process eval: _run's
process_index/process_count shard + raw .npz part files, merge_part_files,
and the scripts/merge_eval.py CLI — the merged dump must be BIT-identical to
the unsharded run's dump.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

from fdt.eval.pr import merge_part_files
from fdt.eval.runner import _run

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_ANNO = os.path.join(_REPO, "data", "mini", "gen_anno_file_mini_val")

pytestmark = pytest.mark.skipif(not os.path.exists(_ANNO),
                                reason="mini dataset not generated")


def _fake_detect(image):
    """Deterministic pure function of the image (same boxes in any shard)."""
    rng = np.random.RandomState(int(image[::7, ::7].sum()) % (2 ** 31))
    n = rng.randint(1, 6)
    h, w = image.shape[:2]
    x1 = rng.rand(n) * (w - 20)
    y1 = rng.rand(n) * (h - 20)
    side = 10 + rng.rand(n) * 60
    # a few exactly-tied confidences across images: the bit-exactness claim
    # covers tie order, which merge_dumps (finalized merge) does NOT preserve
    conf = np.round(rng.rand(n), 1)
    return np.column_stack([x1, y1, x1 + side, y1 + side, conf])


def test_sharded_parts_merge_bit_exact(tmp_path):
    single = _run(_fake_detect, _ANNO, str(tmp_path / "dump.npy"))

    n = 3
    for i in range(n):
        _run(_fake_detect, _ANNO, str(tmp_path / "dump.npy"),
             process_index=i, process_count=n, progress=False)
    parts = [tmp_path / f"dump.part{i}_of_{n}.npz" for i in range(n)]
    assert all(p.exists() for p in parts)
    merged = merge_part_files([str(p) for p in parts])
    np.testing.assert_array_equal(merged, single)

    # CLI merge (shuffled arg order: the script sorts by part index)
    out = tmp_path / "merged.npy"
    r = subprocess.run(
        [sys.executable, os.path.join(_REPO, "scripts", "merge_eval.py"),
         str(parts[2]), str(parts[0]), str(parts[1]), "--out", str(out)],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr[-2000:]
    np.testing.assert_array_equal(np.load(out), single)


def test_sharded_collector_yields_global_ids():
    """img_id stays GLOBAL under process sharding — skip_ids (MTCNN image
    2852), --limit, and display filenames carry whole-dataset semantics."""
    from fdt.data.collector import EvalCollector
    ids = [i for _, _, i in EvalCollector(_ANNO)]
    got = []
    for pi in range(2):
        got += [i for _, _, i in EvalCollector(_ANNO, pi, 2)]
    assert got == ids


def test_run_rejects_lone_process_arg(tmp_path):
    with pytest.raises(ValueError, match="together"):
        _run(_fake_detect, _ANNO, str(tmp_path / "d.npy"), process_count=2)


def test_merge_rejects_incomplete_parts(tmp_path):
    _run(_fake_detect, _ANNO, str(tmp_path / "dump.npy"),
         process_index=0, process_count=3, progress=False)
    part0 = tmp_path / "dump.part0_of_3.npz"
    r = subprocess.run(
        [sys.executable, os.path.join(_REPO, "scripts", "merge_eval.py"),
         str(part0), "--out", str(tmp_path / "m.npy")],
        capture_output=True, text=True, timeout=120)
    assert r.returncode != 0
