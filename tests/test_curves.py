"""Curve tooling tests: loss assembly and PR/ROC plotting (headless)."""
import numpy as np

from fdt.eval.curves import assemble_loss, plot_pr_roc


def test_assemble_loss_roundtrip(tmp_path):
    # two checkpoints, 5-row layout, trailing zeros (partial save buffer)
    a = np.zeros((5, 6))
    a[:, :5] = np.arange(25).reshape(5, 5) + 1.0
    b = np.zeros((5, 6))
    b[:, :3] = (np.arange(15).reshape(5, 3) + 100.0)
    pa, pb = tmp_path / "a.npy", tmp_path / "b.npy"
    np.save(pa, a)
    np.save(pb, b)
    total = assemble_loss([str(pa), str(pb)], index=0)
    np.testing.assert_allclose(total, [1, 2, 3, 4, 5, 100, 101, 102])
    face_conf = assemble_loss([str(pa)], index=2)
    np.testing.assert_allclose(face_conf, [11, 12, 13, 14, 15])


def test_assemble_loss_smoothing(tmp_path):
    a = np.zeros((5, 5))
    a[0, :4] = [2, 4, 6, 8]
    a[1:, :4] = 1
    p = tmp_path / "a.npy"
    np.save(p, a)
    sm = assemble_loss([str(p)], index=0, smooth=2)
    # box filter: value holds until each window of 2 completes
    np.testing.assert_allclose(sm, [2, 3, 3, 7])


def test_plot_pr_roc_writes_files(tmp_path):
    dump = np.array([[1, 0, 1, 0], [0.9, 0.8, 0.7, 3]])
    f = tmp_path / "data_of_x.npy"
    np.save(f, dump)
    plot_pr_roc([str(f)], ["x"], out_prefix=str(tmp_path / "curves"))
    assert (tmp_path / "curves_pr.png").exists()
    assert (tmp_path / "curves_roc.png").exists()
