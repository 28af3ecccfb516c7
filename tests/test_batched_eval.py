"""Size-bucketed batched eval smoke test (throughput path)."""
import numpy as np
import pytest

from fdt.eval.batched import bucket_for, eval_pyramidbox_batched


def test_bucket_for():
    assert bucket_for(1024, 683) == (1024, 768)
    assert bucket_for(1, 1) == (128, 128)


@pytest.mark.slow
def test_batched_eval_smoke(tmp_path, rng):
    import cv2
    from fdt.models.loader import load_pyramidbox_detector

    paths = []
    for i, (w, h) in enumerate([(160, 120), (150, 120), (250, 190)]):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        p = tmp_path / f"img{i}.jpg"
        cv2.imwrite(str(p), img)
        paths.append(p)
    anno = tmp_path / "anno"
    anno.write_text(f"{paths[0]} 1 10 10 40 40\n"
                    f"{paths[1]} 1 20 20 50 50\n"
                    f"{paths[2]} 2 10 10 30 30 60 60 40 40\n")

    det = load_pyramidbox_detector("try3", None)
    dump = eval_pyramidbox_batched(det, str(anno), threshold=0.4,
                                   batch_size=2, progress=False)
    assert dump.shape[0] == 2
    assert dump[1, -1] == 4  # total GT
