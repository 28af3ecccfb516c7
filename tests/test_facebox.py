"""FaceBoxes parity tests: our NHWC flax model + converted faceboxes.pt weights
must reproduce the torch reference's outputs and detections."""
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fdt.models.facebox import FaceBox
from fdt.models.torch_convert import load_torch_state_dict, torch_to_flax

FACEBOX_WEIGHTS = "/root/reference/FACEBOX/faceboxes.pt"


@pytest.fixture(scope="module")
def facebox_variables():
    import pathlib
    if not pathlib.Path(FACEBOX_WEIGHTS).exists():
        pytest.skip("faceboxes.pt not available")
    model = FaceBox()
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3))))
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
    sd = load_torch_state_dict(FACEBOX_WEIGHTS)
    return torch_to_flax(sd, template, strict=True)


@pytest.fixture(scope="module")
def torch_facebox(reference_root):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, str(reference_root))
    try:
        from FACEBOX.networks import FaceBox as TorchFaceBox
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    finally:
        sys.path.pop(0)
    net = TorchFaceBox()
    net.load_state_dict(torch.load(FACEBOX_WEIGHTS, map_location="cpu", weights_only=True))
    net.eval()
    return net


def test_facebox_output_shapes():
    model = FaceBox()
    x = jnp.zeros((1, 1024, 1024, 3))
    var = model.init(jax.random.PRNGKey(0), x)
    loc, conf = model.apply(var, x)
    assert loc.shape == (1, 21824, 4)
    assert conf.shape == (1, 21824, 2)


def test_facebox_forward_matches_torch(facebox_variables, torch_facebox, rng):
    import torch
    img = rng.rand(1, 256, 256, 3).astype(np.float32)
    with torch.no_grad():
        t_loc, t_conf = torch_facebox(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    with jax.default_matmul_precision("highest"):
        loc, conf = FaceBox().apply(facebox_variables, jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(loc), t_loc.numpy(), rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(conf), t_conf.numpy(), rtol=1e-3, atol=2e-3)


def test_facebox_e2e_detect_matches_reference(facebox_variables, torch_facebox,
                                              reference_root):
    import cv2
    import torch
    import torch.nn.functional as F
    from fdt.infer.facebox import FaceBoxDetector

    sys.path.insert(0, str(reference_root))
    try:
        from FACEBOX.encoderl import DataEncoder
    finally:
        sys.path.pop(0)

    img_path = next((reference_root / "image_and_anno/test_image/try1").glob("*.jpg"))
    image = cv2.imread(str(img_path))
    assert image is not None
    im = cv2.resize(image, (1024, 1024))

    # reference pipeline (My_test_facebox.py:12-36) on CPU
    im_t = torch.from_numpy(im.transpose(2, 0, 1)).float().div(255).unsqueeze(0)
    with torch.no_grad():
        t_loc, t_conf = torch_facebox(im_t)
    t_conf = F.softmax(t_conf.squeeze(0), dim=1)
    ref_boxes, ref_probs = DataEncoder().decode_np(t_loc.squeeze(0), t_conf)

    det = FaceBoxDetector(facebox_variables)
    (boxes, scores), = det.detect_batch(im[None])

    assert len(scores) == len(ref_probs)
    # same detections in the same (score-descending) order
    order = np.argsort(-np.asarray(ref_probs), kind="stable")
    np.testing.assert_allclose(np.asarray(scores), np.asarray(ref_probs)[order],
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(ref_boxes)[order],
                               rtol=1e-3, atol=2e-3)


def test_s2d_stem_matches_rdcl(facebox_variables):
    """The space-to-depth RDCL stem (TPU fast path) is numerically the direct
    conv stem: same taps, stride phases packed into MXU-shaped contractions."""
    from fdt.infer.facebox import FaceBoxDetector, _stem_s2d
    from fdt.models.facebox import FaceBox

    model = FaceBox()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 256, 256, 3).astype(np.float32))
    want = model.apply(facebox_variables, x, method="rdcl")
    got = _stem_s2d(facebox_variables, x, "highest")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    det_s2d = FaceBoxDetector(facebox_variables, stem_impl="s2d")
    det_dir = FaceBoxDetector(facebox_variables, stem_impl="direct")
    img = (rng.rand(det_s2d.cfg.input_size, det_s2d.cfg.input_size, 3)
           * 255).astype(np.uint8)
    bs, ss, cs = jax.device_get(det_s2d._detect_impl(det_s2d.variables,
                                                     jnp.asarray(img)[None]))
    bd, sd, cd = jax.device_get(det_dir._detect_impl(det_dir.variables,
                                                     jnp.asarray(img)[None]))
    assert int(cs[0]) == int(cd[0])
    np.testing.assert_allclose(ss, sd, atol=1e-4)
    np.testing.assert_allclose(bs, bd, atol=1e-4)


def test_pinned_config_matches_decode_tensor_semantics(facebox_variables,
                                                       reference_root):
    """FACEBOX_PINNED reproduces the reference's alternative `decode_tensor`
    post-processing (FACEBOX/encoderl.py:327-358): pinning the background
    column to 0.4 before argmax keeps exactly the priors whose face
    probability is strictly above 0.4 (torch ties break toward background;
    the empty-rescue branch is dead code via `... is 0`), then NMS at 0.5.

    Because greedy NMS visits candidates in descending score and suppression
    only flows downward, dropping the (0.35, 0.4] tail cannot change which
    >0.4 boxes survive — so the pinned detector's rows must equal the default
    decode_np detector's rows filtered at score > 0.4."""
    import cv2
    from fdt.config import FACEBOX, FACEBOX_PINNED
    from fdt.infer.facebox import FaceBoxDetector

    # the argmax-after-pin formulation IS strict thresholding (numpy oracle
    # of encoderl.py:341-343: conf[:, 0] = 0.4; conf.max(1) → label)
    rng = np.random.RandomState(0)
    face_p = rng.rand(4096).astype(np.float32)
    face_p[rng.rand(4096) < 0.1] = 0.4            # exercise exact ties
    pinned = np.stack([np.full_like(face_p, 0.4), face_p], 1)
    labels = pinned.argmax(1)                     # ties → index 0 (background)
    np.testing.assert_array_equal(labels == 1, face_p > 0.4)

    img_path = next((reference_root / "image_and_anno/test_image/try1").glob("*.jpg"))
    im = cv2.resize(cv2.imread(str(img_path)), (1024, 1024))

    det = FaceBoxDetector(facebox_variables, cfg=FACEBOX)
    det_pin = FaceBoxDetector(facebox_variables, cfg=FACEBOX_PINNED)
    (boxes, scores), = det.detect_batch(im[None])
    (boxes_p, scores_p), = det_pin.detect_batch(im[None])

    keep = np.asarray(scores) > 0.4
    np.testing.assert_allclose(np.asarray(scores_p), np.asarray(scores)[keep],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(boxes_p), np.asarray(boxes)[keep],
                               atol=1e-6)
