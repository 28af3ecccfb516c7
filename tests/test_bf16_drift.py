"""Quantify bf16-vs-f32 detection drift at eval thresholds (VERDICT r2 #4).

The flagship bench runs the PyramidBox forward in bfloat16 while every parity
test runs f32/highest — this pins the bf16 keep-set/score drift through the
FULL detect pipeline (forward → softmax → decode → NMS → row walk) at the
eval regime (conf 0.35, NMS 0.35, draw_curve/log:31-32), on a detector whose
score landscape is realistic (sparse, well-separated — the conf-head spread
surgery from test_track_golden; raw random weights cluster every score at
~0.5 where threshold flips are meaningless).

The genuinely-trained version (net_weight/try3_mini.npz,
tests/test_trained_weights.py::test_bf16_drift_trained) measured: row counts
equal, 100% matched, median matched IoU 0.992, max |Δscore| 0.0152 — the
surgery-based bounds here are the pessimistic envelope.
"""
import numpy as np
import pytest

from tests.conftest import import_reference
from tests.test_track_golden import _spread_conf_heads

cv2 = pytest.importorskip("cv2")


@pytest.mark.slow
def test_bf16_keepset_drift_bounded(reference_root):
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from fdt.infer.pyramidbox import PyramidBoxDetector
    from fdt.models.pyramidbox_mobile import build_pyramidbox
    from fdt.models.torch_convert import torch_to_flax

    mod = import_reference("pyramid")
    torch.manual_seed(0)
    net = mod.build_sfd("test", 640, 2)
    net.eval()
    # repo's random-init logit margins are already wide (std ~0.5, vs try3's
    # ~0.03): a gentle spread + bg bias leaves ~300 candidates above 0.35 and
    # ~30 above 0.6 per image — under the 750 cap, so no truncation boundary
    # amplifies tail mismatches
    _spread_conf_heads(net, scale=2.3, bg_bias=3.85)
    sd = {k: v.numpy() for k, v in net.state_dict().items()
          if not k.endswith("num_batches_tracked")}

    def build(dtype, precision):
        model = build_pyramidbox("repo", dtype=dtype)
        template = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 128, 128, 3))))
        template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
        variables = torch_to_flax(sd, template, strict=True)
        return PyramidBoxDetector(variables, model, "repo",
                                  precision=precision)

    det_f32 = build(None, "highest")
    det_bf16 = build(jnp.bfloat16, "default")

    files = sorted((reference_root / "image_and_anno/test_image/try1")
                   .glob("*.jpg"))[:3]
    drift = []
    for f in files:
        img = cv2.resize(cv2.imread(str(f)), (256, 192))
        r32 = det_f32.detect_face(img, 0.35)
        r16 = det_bf16.detect_face(img, 0.35)
        assert len(r32) > 1, "scene produced no detections — test is vacuous"
        # keep-set size may flip by a few boxes at the threshold boundary
        assert abs(len(r16) - len(r32)) <= max(2, int(0.15 * len(r32))), \
            (f.name, len(r32), len(r16))
        # greedy-match by IoU; matched boxes must be the same detections
        m = min(len(r32), len(r16))
        ious, dscores = [], []
        for b in r32:
            x1 = np.maximum(b[0], r16[:, 0]); y1 = np.maximum(b[1], r16[:, 1])
            x2 = np.minimum(b[2], r16[:, 2]); y2 = np.minimum(b[3], r16[:, 3])
            inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
            a = (b[2] - b[0]) * (b[3] - b[1])
            a2 = (r16[:, 2] - r16[:, 0]) * (r16[:, 3] - r16[:, 1])
            iou = inter / (a + a2 - inter)
            j = int(iou.argmax())
            if iou[j] > 0.5:
                ious.append(float(iou[j]))
                if iou[j] > 0.9:
                    # score drift is only meaningful on STABLE matches — a
                    # flipped pair compares two different boxes' scores
                    dscores.append(abs(float(b[4]) - float(r16[j, 4])))
        ious = np.array(ious)
        # a "flip" = an f32 box with no bf16 twin at IoU>0.9 (either unmatched
        # entirely, or replaced by an overlapping NMS-alternative)
        unstable = (m - len(ious)) + int((ious < 0.9).sum())
        drift.append((f.name, len(r32), len(r16), unstable,
                      float(np.median(ious)), max(dscores)))
        # measured drift (2026-08-17, CPU backend, 3 sample images):
        # counts within ±1 of f32; 1-11 keep-set flips per ~110-120 boxes
        # (0.9-9.4% — each flipped box replaced by an overlapping
        # alternative); stable matches at median IoU 0.997 with score delta
        # ≤ 0.016.  Bounds assert these with margin.
        assert unstable <= max(6, int(0.12 * m)), drift[-1]
        assert np.median(ious) > 0.98, drift[-1]
        assert max(dscores) < 0.03, drift[-1]
    print("\nbf16-vs-f32 drift at eval thresholds (file, n_f32, n_bf16, "
          "n boundary flips, median matched IoU, max |dscore|):")
    for row in drift:
        print("  ", row)
