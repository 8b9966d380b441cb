"""NMS parity: the fixed-shape on-device NMS must reproduce the reference pipeline
(general.py:518-607) — verified against an independent numpy oracle implementing
torchvision greedy-NMS semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from icafusion_tpu.ops.nms import MAX_WH, detections_to_numpy, non_max_suppression


def np_greedy_nms(boxes, scores, iou_thres):
    """Numpy oracle for torchvision.ops.nms (greedy, score-desc, suppress IoU>t)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(scores), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        a2 = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / (a1 + a2 - inter + 1e-12)
        suppressed |= iou > iou_thres
    return np.array(keep, np.int64)


def np_reference_nms_pipeline(pred, conf_thres, iou_thres, multi_label, max_det=300):
    """Numpy oracle for the full reference non_max_suppression (general.py:518-607)."""
    out = []
    nc = pred.shape[2] - 5
    for x in pred:
        x = x[x[:, 4] > conf_thres]
        if not len(x):
            out.append(np.zeros((0, 6), np.float32))
            continue
        x = x.copy()
        x[:, 5:] *= x[:, 4:5]
        box = np.concatenate([x[:, :2] - x[:, 2:4] / 2, x[:, :2] + x[:, 2:4] / 2], 1)
        if multi_label and nc > 1:
            i, j = np.nonzero(x[:, 5:] > conf_thres)
            x = np.concatenate([box[i], x[i, j + 5, None], j[:, None].astype(np.float32)], 1)
        else:
            conf = x[:, 5:].max(1, keepdims=True)
            j = x[:, 5:].argmax(1, keepdims=True)
            x = np.concatenate([box, conf, j.astype(np.float32)], 1)
            x = x[conf.ravel() > conf_thres]
        if not len(x):
            out.append(np.zeros((0, 6), np.float32))
            continue
        c = x[:, 5:6] * MAX_WH
        keep = np_greedy_nms(x[:, :4] + c, x[:, 4], iou_thres)[:max_det]
        out.append(x[keep])
    return out


def random_preds(rng, b, n, nc, frac_confident=0.05):
    pred = np.zeros((b, n, 5 + nc), np.float32)
    pred[..., 0:2] = rng.uniform(50, 590, (b, n, 2))
    pred[..., 2:4] = rng.uniform(5, 120, (b, n, 2))
    pred[..., 4] = rng.uniform(0, 0.2, (b, n))
    hot = rng.random((b, n)) < frac_confident
    pred[..., 4] = np.where(hot, rng.uniform(0.3, 1.0, (b, n)), pred[..., 4])
    pred[..., 5:] = rng.dirichlet(np.ones(nc), (b, n))
    return pred


@pytest.mark.parametrize("multi_label", [False, True])
@pytest.mark.parametrize("conf", [0.25, 0.001])
def test_nms_matches_numpy_oracle(multi_label, conf):
    rng = np.random.default_rng(0)
    pred = random_preds(rng, 2, 800, 3)
    ours = non_max_suppression(jnp.asarray(pred), conf_thres=conf, iou_thres=0.45,
                               multi_label=multi_label, top_k=4096)
    ours_list = detections_to_numpy(ours)
    ref_list = np_reference_nms_pipeline(pred, conf, 0.45, multi_label)

    for o, r in zip(ours_list, ref_list):
        assert o.shape[0] == r.shape[0], f"kept counts differ: {o.shape[0]} vs {r.shape[0]}"
        # same sets of (box, score, class) in same score order
        np.testing.assert_allclose(o[:, 4], r[:, 4], rtol=1e-5)
        np.testing.assert_allclose(o[:, :4], r[:, :4], rtol=1e-4, atol=1e-3)
        np.testing.assert_array_equal(o[:, 5].astype(int), r[:, 5].astype(int))


def test_nms_max_det_truncation():
    rng = np.random.default_rng(1)
    pred = random_preds(rng, 1, 2000, 1, frac_confident=0.9)
    ours = non_max_suppression(jnp.asarray(pred), conf_thres=0.001, iou_thres=0.99,
                               max_det=50, top_k=2048)
    assert ours.boxes.shape == (1, 50, 4)
    kept = detections_to_numpy(ours)[0]
    ref = np_reference_nms_pipeline(pred, 0.001, 0.99, False, max_det=50)[0]
    assert kept.shape[0] == 50
    np.testing.assert_allclose(kept[:, 4], ref[:, 4], rtol=1e-5)


def np_merge_nms_pipeline(pred, conf_thres, iou_thres, multi_label, max_det=300):
    """Numpy oracle for merge-NMS (general.py:594-600): kept boxes become the
    conf-weighted mean of all candidates with IoU > thresh (class-offset space);
    keeps matched only by themselves are dropped (redundant=True)."""
    out = []
    nc = pred.shape[2] - 5
    for x in pred:
        x = x[x[:, 4] > conf_thres]
        if not len(x):
            out.append(np.zeros((0, 6), np.float32))
            continue
        x = x.copy()
        x[:, 5:] *= x[:, 4:5]
        box = np.concatenate([x[:, :2] - x[:, 2:4] / 2, x[:, :2] + x[:, 2:4] / 2], 1)
        if multi_label and nc > 1:
            i, j = np.nonzero(x[:, 5:] > conf_thres)
            x = np.concatenate([box[i], x[i, j + 5, None],
                                j[:, None].astype(np.float32)], 1)
        else:
            conf = x[:, 5:].max(1, keepdims=True)
            j = x[:, 5:].argmax(1, keepdims=True)
            x = np.concatenate([box, conf, j.astype(np.float32)], 1)
            x = x[conf.ravel() > conf_thres]
        if not len(x):
            out.append(np.zeros((0, 6), np.float32))
            continue
        c = x[:, 5:6] * MAX_WH
        boxes_off = x[:, :4] + c
        keep = np_greedy_nms(boxes_off, x[:, 4], iou_thres)[:max_det]
        # pairwise IoU of kept vs all candidates in offset space
        lt = np.maximum(boxes_off[keep, None, :2], boxes_off[None, :, :2])
        rb = np.minimum(boxes_off[keep, None, 2:], boxes_off[None, :, 2:])
        inter = np.clip(rb - lt, 0, None).prod(-1)
        a1 = (boxes_off[keep, 2] - boxes_off[keep, 0]) * \
             (boxes_off[keep, 3] - boxes_off[keep, 1])
        a2 = (boxes_off[:, 2] - boxes_off[:, 0]) * \
             (boxes_off[:, 3] - boxes_off[:, 1])
        iou = inter / (a1[:, None] + a2[None, :] - inter + 1e-12) > iou_thres
        w = iou * x[:, 4][None, :]
        kept = x[keep].copy()
        kept[:, :4] = (w @ x[:, :4]) / w.sum(1, keepdims=True)
        out.append(kept[iou.sum(1) > 1])
    return out


@pytest.mark.parametrize("multi_label", [False, True])
def test_merge_nms_matches_numpy_oracle(multi_label):
    rng = np.random.default_rng(3)
    pred = random_preds(rng, 2, 600, 3, frac_confident=0.2)
    ours = non_max_suppression(jnp.asarray(pred), conf_thres=0.25, iou_thres=0.45,
                               multi_label=multi_label, top_k=4096, merge=True)
    ours_list = detections_to_numpy(ours)
    ref_list = np_merge_nms_pipeline(pred, 0.25, 0.45, multi_label)
    for o, r in zip(ours_list, ref_list):
        assert o.shape[0] == r.shape[0], f"kept counts differ: {o.shape[0]} vs {r.shape[0]}"
        np.testing.assert_allclose(o[:, 4], r[:, 4], rtol=1e-5)
        np.testing.assert_allclose(o[:, :4], r[:, :4], rtol=1e-4, atol=1e-2)
        np.testing.assert_array_equal(o[:, 5].astype(int), r[:, 5].astype(int))


def test_nms_empty_input():
    pred = np.zeros((1, 100, 8), np.float32)
    dets = non_max_suppression(jnp.asarray(pred), conf_thres=0.25)
    assert not np.asarray(dets.valid).any()


def test_nms_class_separation():
    # identical overlapping boxes in different classes must both survive
    pred = np.zeros((1, 2, 7), np.float32)
    pred[0, :, :4] = [100, 100, 50, 50]
    pred[0, :, 4] = 0.9
    pred[0, 0, 5] = 1.0
    pred[0, 1, 6] = 1.0
    dets = non_max_suppression(jnp.asarray(pred), conf_thres=0.25, iou_thres=0.45)
    assert int(np.asarray(dets.valid).sum()) == 2
    # agnostic mode collapses them to one
    dets_a = non_max_suppression(jnp.asarray(pred), conf_thres=0.25, iou_thres=0.45,
                                 agnostic=True)
    assert int(np.asarray(dets_a.valid).sum()) == 1


@pytest.mark.parametrize("multi_label", [False, True])
def test_nms_classes_filter(multi_label):
    """classes= keeps only the listed ids (general.py:574-576). In best-class
    mode an excluded-best row is DROPPED, not reassigned to its best allowed
    class — verified against the oracle run on class-filtered rows."""
    rng = np.random.default_rng(3)
    pred = random_preds(rng, 2, 600, 4)
    keep_cls = (1, 3)
    ours = non_max_suppression(jnp.asarray(pred), conf_thres=0.25,
                               iou_thres=0.45, multi_label=multi_label,
                               top_k=4096, classes=keep_cls)
    # oracle: replicate the reference row filter, then the plain pipeline
    ref_list = np_reference_nms_pipeline(pred, 0.25, 0.45, multi_label)
    for o, r in zip(detections_to_numpy(ours), ref_list):
        r = r[np.isin(r[:, 5].astype(int), keep_cls)]
        assert set(np.unique(o[:, 5].astype(int))) <= set(keep_cls)
        assert o.shape[0] == r.shape[0]
        np.testing.assert_allclose(o[:, 4], r[:, 4], rtol=1e-5)
        np.testing.assert_array_equal(o[:, 5].astype(int), r[:, 5].astype(int))
