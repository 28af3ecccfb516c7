"""End-to-end MTCNN training workflow on the pseudo-labeled mini dataset.

Chains the full reference pipeline through the library entry points:
  gen_Pnet_train_data -> assemble -> train_pnet        (data_preprocess/ + train_net/train.py:30-95)
  -> gen_Rnet_train_data (hard mining w/ trained PNet) -> train_rnet
  -> gen_landmark_48 + gen_Onet_train_data (P+R)       -> train_onet
  -> MtcnnDetector.detect_face with the trained stages  (core/detect.py:585-620)

The point is integration: every stage consumes the previous stage's real
artifacts (patch jpgs + anno lists on disk), the trainers run real jitted
steps, and the mined hard examples come from the actually-trained nets.
Assertions are on learning signal (pos/neg separation, loss decrease) and on
the bucket/label contracts, not on absolute accuracy — 2 epochs on 6 images
is a workflow check, not a convergence run.
"""
import os

import numpy as np
import pytest

import jax

from fdt.config import MTCNNConfig
from fdt.data.mtcnn_data import (assemble_annotations, gen_hard_example_data,
                                 gen_landmark_data, gen_pnet_train_data,
                                 parse_mtcnn_imdb)
from fdt.train.mtcnn_train import MTCNNStageTrainer, train_stage

cv2 = pytest.importorskip("cv2")

MINI_ANNO = os.path.join(os.path.dirname(__file__), "..",
                         "data/mini/gen_anno_file_mini_train")
N_IMAGES = 6  # bound the pyramid-detect and patch-factory cost

# low cascade thresholds + min_face 40 (the PNet patch factory only harvests
# positives from faces >= 40px, gen_Pnet_train_data.py:85): keeps candidates
# flowing through a 2-epoch net and keeps the image pyramids small
CFG = MTCNNConfig(min_face_size=40.0, thresholds=(0.4, 0.2, 0.1))


def _wider_anno(tmp_path):
    """mini gen_anno lines (path N x y w h ...) -> MTCNN wider_anno format
    (path x1 y1 x2 y2 ...), the input of the patch factories."""
    out = tmp_path / "wider_anno.txt"
    lines = []
    for line in open(MINI_ANNO).readlines()[:N_IMAGES]:
        cells = line.split()
        path, n = cells[0], int(cells[1])
        xywh = np.array(cells[2:2 + 4 * n], float).reshape(-1, 4)
        x1y1 = xywh[:, :2]
        x2y2 = x1y1 + xywh[:, 2:] - 1
        corners = np.hstack([x1y1, x2y2]).astype(int)
        lines.append(path + " " + " ".join(map(str, corners.ravel())) + "\n")
    out.write_text("".join(lines))
    return str(out)


def _landmark_anno(tmp_path, wider_anno):
    """Synthetic 5-point landmarks at canonical face fractions (the mini set
    has no landmark labels); format: path x1 x2 y1 y2 lm*10
    (CelebA ordering, gen_landmark_48.py)."""
    frac = np.array([[0.3, 0.35], [0.7, 0.35], [0.5, 0.55],
                     [0.35, 0.75], [0.65, 0.75]])
    out = tmp_path / "landmark_anno.txt"
    lines = []
    for line in open(wider_anno):
        cells = line.split()
        path = cells[0]
        boxes = np.array(cells[1:], float).reshape(-1, 4)
        for x1, y1, x2, y2 in boxes:
            if x2 - x1 < 40:
                continue
            lm = frac * [x2 - x1, y2 - y1] + [x1, y1]
            lines.append(f"{path} {x1} {x2} {y1} {y2} "
                         + " ".join(f"{v:.1f}" for v in lm.ravel()) + "\n")
    out.write_text("".join(lines))
    return str(out)


def _mean_prob(trainer, state, imdb, label):
    """Mean predicted face prob over the records of one label class."""
    from fdt.data.mtcnn_data import mtcnn_batches
    recs = [r for r in imdb if r["label"] == label][:64]
    probs = []
    for ims, *_ in mtcnn_batches(recs, min(16, len(recs)), shuffle=False):
        out = trainer.model.apply({"params": state.params},
                                  ims.astype(np.float32) / 255.0)
        p = np.asarray(out[0]).reshape(len(ims), -1)[:, 0]
        probs.append(p)
    return float(np.concatenate(probs).mean())


def _stage_imdb(out_dir, size, tmp_path, with_landmarks=None):
    anno_dir = os.path.join(out_dir, "anno_store")
    files = [os.path.join(anno_dir, f"{k}_{size}.txt")
             for k in ("pos", "neg", "part")]
    files = [f for f in files if os.path.getsize(f) > 0]
    if with_landmarks:
        files.append(with_landmarks)
    merged = str(tmp_path / f"imglist_{size}.txt")
    assemble_annotations(merged, files, np.random.RandomState(0),
                         base_num=10_000)
    return parse_mtcnn_imdb(merged)


@pytest.mark.slow
def test_full_training_workflow(tmp_path):
    wider = _wider_anno(tmp_path)

    # ---- stage 1: PNet patches + training --------------------------------
    st12 = gen_pnet_train_data(wider, "", str(tmp_path / "d12"),
                               rng=np.random.RandomState(0), neg_per_image=10)
    assert st12.pos > 20 and st12.part > 20 and st12.neg > N_IMAGES * 10
    imdb12 = _stage_imdb(str(tmp_path / "d12"), 12, tmp_path)
    logs = []
    p_state = train_stage("pnet", imdb12, end_epoch=6, batch_size=32,
                          model_store_path=str(tmp_path / "ckpt_p"),
                          base_lr=0.01, frequent=5, log=logs.append)
    assert int(p_state.step) >= 6 * (len(imdb12) // 32)
    assert os.path.isdir(str(tmp_path / "ckpt_p"))
    p_trainer = MTCNNStageTrainer("pnet")
    pos_p = _mean_prob(p_trainer, p_state, imdb12, 1)
    neg_p = _mean_prob(p_trainer, p_state, imdb12, 0)
    assert pos_p > neg_p + 0.2, (pos_p, neg_p)  # learned pos/neg separation

    # ---- stage 2: hard examples mined with the TRAINED PNet -> RNet ------
    from fdt.infer.mtcnn import MTCNNDetector
    r_init = MTCNNStageTrainer("rnet").init_state(jax.random.PRNGKey(1))
    o_init = MTCNNStageTrainer("onet").init_state(jax.random.PRNGKey(2))
    det = MTCNNDetector({"params": p_state.params},
                        {"params": r_init.params},
                        {"params": o_init.params}, cfg=CFG)

    def detect_p(img):
        _, aligned = det.detect_pnet(img)
        return aligned

    st24 = gen_hard_example_data(detect_p, wider, "", str(tmp_path / "d24"),
                                 image_size=24, neg_cap_per_image=10)
    assert st24.neg > 0 and st24.pos + st24.part > 0, st24
    imdb24 = _stage_imdb(str(tmp_path / "d24"), 24, tmp_path)
    r_state = train_stage("rnet", imdb24, end_epoch=2,
                          batch_size=min(32, len(imdb24)),
                          model_store_path=str(tmp_path / "ckpt_r"),
                          base_lr=1e-3, frequent=5, log=logs.append)
    assert np.isfinite(float(jax.tree.reduce(
        lambda a, b: a + np.abs(b).sum(), r_state.params, 0.0)))

    # ---- stage 3: P+R hard examples + landmark patches -> ONet -----------
    det = MTCNNDetector({"params": p_state.params},
                        {"params": r_state.params},
                        {"params": o_init.params}, cfg=CFG)

    def detect_pr(img):
        _, aligned = det.detect_pnet(img)
        if aligned is None:
            return None
        _, aligned = det.detect_rnet(img, aligned)
        return aligned

    st48 = gen_hard_example_data(detect_pr, wider, "", str(tmp_path / "d48"),
                                 image_size=48, neg_cap_per_image=10)
    n_lm = gen_landmark_data(_landmark_anno(tmp_path, wider), "",
                             str(tmp_path / "d48"), image_size=48)
    assert n_lm > 0
    lm_anno = str(tmp_path / "d48" / "anno_store" / "landmark_48.txt")
    imdb48 = _stage_imdb(str(tmp_path / "d48"), 48, tmp_path,
                         with_landmarks=lm_anno)
    assert st48.neg + st48.pos + st48.part > 0, st48
    o_state = train_stage("onet", imdb48, end_epoch=2,
                          batch_size=min(16, len(imdb48)),
                          model_store_path=str(tmp_path / "ckpt_o"),
                          base_lr=1e-3, frequent=5, log=logs.append)

    # landmark loss must actually train (label -2 mask path)
    o_trainer = MTCNNStageTrainer("onet", base_lr=1e-3)
    from fdt.data.mtcnn_data import mtcnn_batches
    lm_recs = [r for r in imdb48 if r["label"] == -2]
    ims, lab, bb, lm = next(mtcnn_batches(lm_recs, min(8, len(lm_recs)),
                                          shuffle=False))
    def lm_loss(state):
        _, (_, _, l_lm, _) = o_trainer._loss(state.params, ims, lab, bb, lm)
        return float(l_lm)
    assert lm_loss(o_state) < lm_loss(o_init), \
        (lm_loss(o_state), lm_loss(o_init))

    # ---- full cascade with the trained stages runs end to end ------------
    det = MTCNNDetector({"params": p_state.params},
                        {"params": r_state.params},
                        {"params": o_state.params}, cfg=CFG)
    img = cv2.imread(open(wider).readline().split()[0])
    boxes, landmarks = det.detect_face(img)
    if boxes.size:  # empty is legal for a 2-epoch cascade (early-out path)
        assert boxes.ndim == 2 and boxes.shape[1] == 5
        assert landmarks.shape == (boxes.shape[0], 10)
        assert np.isfinite(boxes).all()
