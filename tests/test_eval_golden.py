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
    # tf flags bit-equal positionally — except that the global conf-descending
    # sort may legitimately swap rows whose confidences differ only by
    # forward-pass float drift (NCHW vs NHWC).  Such swaps keep the tf
    # MULTISET intact at near-identical conf, so the PR curve is unchanged
    # beyond float noise; anything else (a detection gaining/losing its GT
    # match) changes the multiset and still fails.
    mism = np.where(ours[0] != ref[0])[0]
    for grp in np.split(mism, np.where(np.diff(mism) > 1)[0] + 1) if mism.size else []:
        # a swap is only sort-order ambiguity if the swapped rows' confs are
        # themselves indistinguishable within tolerance
        assert ours[1, grp].max() - ours[1, grp].min() <= 2 * conf_atol, \
            (grp, ours[:, grp], ref[:, grp])
        assert sorted(ours[0, grp]) == sorted(ref[0, grp]), \
            (grp, ours[:, grp], ref[:, grp])


def _small_anno(tmp_path_factory, sizes, name):
    """Write downscaled copies of the sample images (distinct native
    resolutions) + synthetic GT.  Small sizes keep the per-resolution CPU
    compiles of the ResNet50 graph tractable while still exercising the
    per-image native-resolution prior rebuild (My_test.py:31-36)."""
    import cv2
    rng = np.random.RandomState(3)
    d = tmp_path_factory.mktemp(name)
    lines = []
    for i, (p, (w, h)) in enumerate(zip(SAMPLES, sizes)):
        img = cv2.resize(cv2.imread(str(p)), (w, h))
        path = d / f"im_{i}.jpg"
        cv2.imwrite(str(path), img)
        n = rng.randint(1, 4)
        boxes = []
        for _ in range(n):
            bw, bh = rng.randint(20, w // 2), rng.randint(20, h // 2)
            boxes += [rng.randint(0, w - bw), rng.randint(0, h - bh), bw, bh]
        lines.append(f"{path} {n} " + " ".join(map(str, boxes)))
    anno = d / "gen_anno_file_mini"
    anno.write_text("\n".join(lines) + "\n")
    return str(anno)


_PYRAMID_THRESH = 0.3  # draw_curve/log:31-32 eval regime (conf min ~0.35)


def _pyramid_ref_detect_fn(net, variant):
    """In-process CPU replica of My_test.py:22-72 detect_face for `net`."""
    import torch
    layers = import_reference("layers")

    def ref_detect(image):
        h, w, _ = image.shape
        x = image.astype(np.float32) - np.array([104, 117, 123], np.float32)
        x = torch.from_numpy(x).permute(2, 0, 1)[None]
        if variant in ("repo", "try1", "try2"):
            net.priorbox = layers.PriorBoxLayer(w, h)
        else:
            net.priorbox = layers.PriorBoxLayer(
                w, h, stride=[4, 8, 16, 32, 64], box=(16, 32, 64, 128, 256))
        net.firstTime = True
        net.detect = layers.Detect(2, 0, 750, _PYRAMID_THRESH, 0.35)
        with torch.no_grad():
            y = net(x)
        detections = y.data
        scale = torch.Tensor([w, h, w, h])
        boxes, scores = [], []
        for i in range(detections.size(1)):
            j = 0
            while detections[0, i, j, 0] >= _PYRAMID_THRESH:
                scores.append(detections[0, i, j, 0])
                pt = (detections[0, i, j, 1:] * scale).cpu().numpy()
                boxes.append([pt[0], pt[1], pt[2], pt[3]])
                j += 1
                if j >= detections.size(2):
                    break
        det_conf = np.array(scores).astype(np.float64)
        boxes = np.array(boxes)
        if boxes.shape[0] == 0:
            return np.array([[0, 0, 0, 0, 0.4]])
        return np.column_stack((boxes, det_conf))

    return ref_detect


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["repo", "try1", "try2", "try3", "try4",
                                     "try5"])
def test_pyramid_eval_dump_golden(variant, tmp_path_factory, reference_root):
    """Flagship-family L3–L5 golden: the full My_test.py pipeline (torch CPU,
    seeded random weights converted through torch_convert) vs eval_pyramidbox,
    dump-compared with bit-equal tf rows (My_test.py:163-171 accumulation +
    the :61-62 sentinel, per-image native-resolution priors at :31-36)."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from fdt.eval.runner import eval_pyramidbox
    from fdt.infer.pyramidbox import PyramidBoxDetector
    from fdt.models.torch_convert import torch_to_flax

    if variant == "repo":
        ref_mod, sizes = "pyramid", [(256, 192), (224, 288), (256, 192)]
        from fdt.models.pyramidbox import PyramidBox
        model = PyramidBox()
    else:
        from tests.test_pyramid_mobile import _REF_MODULES
        from fdt.models.pyramidbox_mobile import build_pyramidbox
        ref_mod, sizes = _REF_MODULES[variant], [(256, 192), (224, 288)]
        model = build_pyramidbox(variant)
    mod = import_reference(ref_mod)
    torch.manual_seed(0)
    builder = getattr(mod, "build_sfd", None) or mod.build_sfd_mobile
    net = builder("test", 640, 2)
    net.eval()

    anno = _small_anno(tmp_path_factory, sizes, f"pyr_{variant}")
    want = _reference_loop(_pyramid_ref_detect_fn(net, variant), anno)

    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3))))
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
    sd = {k: v.numpy() for k, v in net.state_dict().items()
          if not k.endswith("num_batches_tracked")}
    # 5-map variants allocate 6 face heads but use 5 (reference load_weights
    # filtered-load semantics) — strict only for the repo net
    variables = torch_to_flax(sd, template, strict=(variant == "repo"))
    det = PyramidBoxDetector(variables, model, variant)
    got = eval_pyramidbox(det, anno, threshold=_PYRAMID_THRESH, progress=False)
    _compare_dumps(got, want, conf_atol=5e-3)


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
