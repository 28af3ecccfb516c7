"""FaceBox train-time encoder parity.

NOTE: the reference's DataEncoder.encode is unreachable as shipped — its guard
`if inf_flag.long().sum() is not 0:` (encoderl.py:196) compares a tensor by
identity with int 0, so it is always True and `raise inf_error` hits a
NameError on every call.  (FaceBoxes training is absent from the reference, so
this never surfaced.)  The oracle below re-derives encoderl.py:158-215 with the
guard removed.
"""
import numpy as np
import jax.numpy as jnp

from fdt.anchors import facebox_default_boxes
from fdt.anchors.densified import facebox_encode


def oracle_encode(gt, labels, df_cs, threshold=0.35):
    pf = np.concatenate([df_cs[:, :2] - df_cs[:, 2:] / 2,
                         df_cs[:, :2] + df_cs[:, 2:] / 2], 1)
    inter_w = np.maximum(0, np.minimum(gt[:, None, 2], pf[None, :, 2]) -
                         np.maximum(gt[:, None, 0], pf[None, :, 0]))
    inter_h = np.maximum(0, np.minimum(gt[:, None, 3], pf[None, :, 3]) -
                         np.maximum(gt[:, None, 1], pf[None, :, 1]))
    inter = inter_w * inter_h
    area_g = (gt[:, 2] - gt[:, 0]) * (gt[:, 3] - gt[:, 1])
    area_d = (pf[:, 2] - pf[:, 0]) * (pf[:, 3] - pf[:, 1])
    iou_m = inter / (area_g[:, None] + area_d[None, :] - inter)
    max_iou_index = iou_m.argmax(1)              # best default per GT
    iou = iou_m.max(0)
    max_index = iou_m.argmax(0)                  # best GT per default
    max_index[max_iou_index] = np.arange(gt.shape[0])
    boxes = gt[max_index]
    cxcy = ((boxes[:, :2] + boxes[:, 2:]) / 2 - df_cs[:, :2]) / (0.1 * df_cs[:, 2:])
    wh = np.log((boxes[:, 2:] - boxes[:, :2]) / df_cs[:, 2:]) / 0.2
    loc = np.concatenate([cxcy, wh], 1)
    conf = labels[max_index].copy()
    conf[iou < threshold] = 0
    conf[max_iou_index] = 1
    return loc, conf


def test_facebox_encode_matches_oracle(rng):
    df = facebox_default_boxes()
    g = 5
    xy = rng.rand(g, 2) * 0.6 + 0.05
    wh = rng.rand(g, 2) * 0.2 + 0.05
    gt = np.concatenate([xy, xy + wh], 1).astype(np.float32)
    labels = np.ones(g, np.int64)
    want_loc, want_conf = oracle_encode(gt, labels, df)

    pad = 8 - g
    gt_p = np.concatenate([gt, np.zeros((pad, 4), np.float32)])
    lab_p = np.concatenate([labels, np.zeros(pad, np.int64)])
    valid = np.concatenate([np.ones(g, bool), np.zeros(pad, bool)])
    loc, conf = facebox_encode(jnp.asarray(gt_p), jnp.asarray(lab_p),
                               jnp.asarray(valid), jnp.asarray(df))
    np.testing.assert_array_equal(np.asarray(conf), want_conf)
    mask = np.asarray(conf) > 0
    np.testing.assert_allclose(np.asarray(loc)[mask], want_loc[mask],
                               rtol=1e-3, atol=1e-3)
