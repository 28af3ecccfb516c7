"""End-to-end eval runner smoke tests on a synthetic mini-dataset."""
import numpy as np
import pytest

from fdt.eval.runner import eval_facebox, eval_pyramidbox


@pytest.fixture()
def mini_dataset(tmp_path, rng):
    import cv2
    paths = []
    for i in range(2):
        img = (rng.rand(120 + 8 * i, 160, 3) * 255).astype(np.uint8)
        p = tmp_path / f"img{i}.jpg"
        cv2.imwrite(str(p), img)
        paths.append(p)
    anno = tmp_path / "anno"
    anno.write_text(
        f"{paths[0]} 2 10 10 30 30 50 50 40 40\n"
        f"{paths[1]} 1 20 20 50 50\n")
    return anno


def test_eval_facebox_smoke(mini_dataset, tmp_path):
    import pathlib
    if not pathlib.Path("/root/reference/FACEBOX/faceboxes.pt").exists():
        pytest.skip("weights unavailable")
    from fdt.models.loader import load_facebox_detector
    det = load_facebox_detector("/root/reference/FACEBOX/faceboxes.pt")
    dump = eval_facebox(det, str(mini_dataset),
                        dump_path=str(tmp_path / "d.npy"), progress=False)
    assert dump.shape[0] == 2
    assert dump[1, -1] == 3  # GT count
    assert (tmp_path / "d.npy").exists()
    # sorted descending by confidence
    confs = dump[1, :-1]
    assert np.all(np.diff(confs) <= 1e-9)


@pytest.mark.slow
def test_eval_pyramidbox_smoke(mini_dataset, tmp_path):
    from fdt.models.loader import load_pyramidbox_detector
    det = load_pyramidbox_detector("try3", None)  # random init, light variant
    dump = eval_pyramidbox(det, str(mini_dataset), threshold=0.4,
                           dump_path=str(tmp_path / "d.npy"), progress=False)
    assert dump.shape[0] == 2
    assert dump[1, -1] == 3
