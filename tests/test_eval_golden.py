"""Process-level eval-dump goldens: the complete `data_of_<net>.npy` produced
by our eval runners over a mini-dataset vs the reference My_test pipelines run
in-process (torch CPU, shipped pretrained weights).

These pin the whole L3–L5 stack at once — detector, row extraction, calc_pr,
sort order, GT sentinel (MTCNN/My_test_mtcnn.py:27-54, FACEBOX/
My_test_facebox.py:56-87).  The tf row and GT count must match exactly; confs
match to forward-pass float tolerance (torch NCHW vs our NHWC).
"""
import pathlib

import numpy as np
import pytest

from tests.conftest import import_reference

SAMPLES = sorted(pathlib.Path(
    "/root/reference/image_and_anno/test_image/try1").glob("*.jpg"))[:6]
MTCNN_P = "/root/reference/MTCNN/original_model/pnet_epoch.pt"
FACEBOX_PT = "/root/reference/FACEBOX/faceboxes.pt"


@pytest.fixture(scope="module")
def mini_anno(tmp_path_factory):
    """gen_anno_file over the shipped sample images with synthetic GT boxes
    (GT only drives the tf flags / truth_num; both pipelines see the same)."""
    import cv2
    rng = np.random.RandomState(7)
    lines = []
    for p in SAMPLES:
        h, w = cv2.imread(str(p)).shape[:2]
        n = rng.randint(1, 4)
        boxes = []
        for _ in range(n):
            bw = rng.randint(30, max(w // 3, 40))
            bh = rng.randint(30, max(h // 3, 40))
            x = rng.randint(0, max(w - bw, 1))
            y = rng.randint(0, max(h - bh, 1))
            boxes += [x, y, bw, bh]
        lines.append(f"{p} {n} " + " ".join(map(str, boxes)))
    anno = tmp_path_factory.mktemp("anno") / "gen_anno_file_mini"
    anno.write_text("\n".join(lines) + "\n")
    return str(anno)


def _reference_loop(detect_fn, anno_file):
    """The shared accumulation tail of the reference My_test_* drivers
    (My_test_mtcnn.py:41-54): calc_pr per image, hstack, desc sort, sentinel."""
    calc_performance = import_reference("utils.calc_performance")
    data_collector = import_reference("utils.data_collector")
    tf_conf = np.array([[], []])
    truth_num = 0
    for image, target, img_id in iter(data_collector.Data_collector(anno_file)):
        predict = detect_fn(image)
        if len(predict) == 0:
            tf_conf_, truth_num_ = np.array([[], []]), target.shape[0]
        else:
            tf_conf_, truth_num_ = calc_performance.calc_pr(predict, target,
                                                            iou_thresh=0.5)
        tf_conf = np.hstack((tf_conf, tf_conf_))
        truth_num += truth_num_
    tf_conf = tf_conf[:, np.argsort(tf_conf[1, :])[::-1]]
    return np.hstack((tf_conf, [[0], [truth_num]]))


def _compare_dumps(ours, ref, conf_atol):
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    assert ours[1, -1] == ref[1, -1]                      # GT sentinel
    np.testing.assert_allclose(ours[1, :-1], ref[1, :-1], atol=conf_atol)
    np.testing.assert_array_equal(ours[0], ref[0])        # tf flags bit-equal


@pytest.mark.slow
def test_mtcnn_eval_dump_golden(mini_anno, reference_root):
    if not pathlib.Path(MTCNN_P).exists():
        pytest.skip("MTCNN weights not available")
    torch = pytest.importorskip("torch")
    detect_mod = import_reference("MTCNN.mtcnn.core.detect")
    torch.cuda.memory_cached = lambda *a, **k: 0
    pnet, rnet, onet = detect_mod.create_mtcnn_net(
        MTCNN_P, MTCNN_P.replace("pnet", "rnet"), MTCNN_P.replace("pnet", "onet"),
        use_cuda=False)
    # My_test_mtcnn.py:13 builds the eval detector with min_face_size=24
    ref_det = detect_mod.MtcnnDetector(pnet=pnet, rnet=rnet, onet=onet,
                                       min_face_size=24)

    def ref_detect(image):
        predict, _ = ref_det.detect_face(image)
        return predict

    want = _reference_loop(ref_detect, mini_anno)

    import dataclasses

    from fdt.config import MTCNN
    from fdt.eval.runner import eval_mtcnn
    from fdt.infer.mtcnn import load_mtcnn_detector

    det = load_mtcnn_detector(MTCNN_P, MTCNN_P.replace("pnet", "rnet"),
                              MTCNN_P.replace("pnet", "onet"),
                              cfg=dataclasses.replace(MTCNN, min_face_size=24.0))
    got = eval_mtcnn(det, mini_anno, skip_ids=(), progress=False)
    _compare_dumps(got, want, conf_atol=5e-3)


@pytest.mark.slow
def test_facebox_eval_dump_golden(mini_anno, reference_root):
    if not pathlib.Path(FACEBOX_PT).exists():
        pytest.skip("faceboxes.pt not available")
    import cv2
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    networks = import_reference("FACEBOX.networks")
    encoderl = import_reference("FACEBOX.encoderl")
    net = networks.FaceBox()
    net.load_state_dict(torch.load(FACEBOX_PT, map_location="cpu",
                                   weights_only=True))
    net.eval()
    enc = encoderl.DataEncoder()

    def ref_detect(image):
        # My_test_facebox.py:12-36,60-62
        im = cv2.resize(image, (1024, 1024))
        x = torch.from_numpy(im.transpose(2, 0, 1)).float().div(255)
        with torch.no_grad():
            loc, conf = net(x[None])
        loc = loc.detach().squeeze(0)
        conf = F.softmax(conf.squeeze(0), dim=1).detach()
        boxes, probs = enc.decode_np(loc, conf)
        h, w, _ = image.shape
        return np.column_stack((boxes * np.array([w, h, w, h]), probs))

    want = _reference_loop(ref_detect, mini_anno)

    import jax
    import jax.numpy as jnp

    from fdt.eval.runner import eval_facebox
    from fdt.infer.facebox import FaceBoxDetector
    from fdt.models.facebox import FaceBox
    from fdt.models.torch_convert import load_torch_state_dict, torch_to_flax

    model = FaceBox()
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3))))
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
    variables = torch_to_flax(load_torch_state_dict(FACEBOX_PT), template,
                              strict=True)
    got = eval_facebox(FaceBoxDetector(variables), mini_anno, progress=False)
    _compare_dumps(got, want, conf_atol=5e-3)
