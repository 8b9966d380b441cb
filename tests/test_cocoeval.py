"""COCO AP/AR evaluator vs the reference's vendored pycocotools fork.

The reference executes pycocotools COCOeval on saved detection jsons
(test.py:329-352); its repo vendors the evaluator at
evaluation_script/cocoeval.py + coco.py. Those are imported IN-PROCESS here as
the oracle (with two environment shims: a numpy bbox-IoU standing in for the
stripped C maskUtils, and np.float for modern numpy) and compared against
icafusion_tpu.eval.cocoeval on randomized synthetic data with crowds, empty
(image, category) cells, score ties and out-of-range areas.
"""

import sys
import types

import numpy as np
import pytest

from icafusion_tpu.eval.cocoeval import CocoDetEval, bbox_iou_xywh

REF = "/root/reference/evaluation_script"


def _load_oracle():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if not hasattr(np, "float"):
        np.float = float  # the vendored fork predates numpy 1.24
    import cocoeval as ref_cocoeval
    import coco as ref_coco
    # the fork strips its C maskUtils; bbox IoU is all the bbox path needs
    ref_cocoeval.maskUtils = types.SimpleNamespace(
        iou=lambda d, g, crowd: bbox_iou_xywh(
            np.asarray(d, np.float64).reshape(-1, 4),
            np.asarray(g, np.float64).reshape(-1, 4),
            np.asarray(crowd, int)))
    return ref_coco, ref_cocoeval


def synth(seed, n_img=8, n_cat=3, n_gt=90, n_dt=260):
    rng = np.random.default_rng(seed)
    images = [{"id": i} for i in range(n_img)]
    cats = [{"id": c} for c in range(n_cat)]
    anns = []
    for i in range(n_gt):
        # areas spanning small/medium/large buckets
        w, h = rng.uniform(4, 200, 2)
        anns.append({
            "id": i + 1,
            "image_id": int(rng.integers(n_img)),
            "category_id": int(rng.integers(n_cat)),
            "bbox": [float(rng.uniform(0, 500)), float(rng.uniform(0, 500)),
                     float(w), float(h)],
            "area": float(w * h),
            "iscrowd": int(rng.random() < 0.12),
        })
    gt = {"images": images, "annotations": anns, "categories": cats}
    dts = []
    for _ in range(n_dt):
        if rng.random() < 0.6 and anns:  # jittered copy of a gt (some TPs)
            a = anns[rng.integers(len(anns))]
            bb = np.array(a["bbox"]) + rng.normal(0, 6, 4)
            cat = a["category_id"]
            img = a["image_id"]
        else:  # random box
            bb = np.array([rng.uniform(0, 500), rng.uniform(0, 500),
                           rng.uniform(4, 200), rng.uniform(4, 200)])
            cat = int(rng.integers(n_cat))
            img = int(rng.integers(n_img))
        bb[2:] = np.maximum(bb[2:], 1.0)
        # quantized scores to force ties through the stable sorts
        dts.append({"image_id": img, "category_id": cat,
                    "bbox": [float(v) for v in bb],
                    "score": float(np.round(rng.random(), 2))})
    return gt, dts


@pytest.mark.parametrize("seed", [0, 7])
def test_cocoeval_matches_reference(seed, capsys):
    ref_coco, ref_cocoeval = _load_oracle()
    gt, dts = synth(seed)

    coco_gt = ref_coco.COCO()
    coco_gt.dataset = gt
    coco_gt.createIndex()
    coco_dt = coco_gt.loadRes([dict(d) for d in dts])
    ev = ref_cocoeval.COCOeval(coco_gt, coco_dt, "bbox")
    ev.evaluate()
    ev.accumulate()
    ev.summarize()
    ref_stats = np.asarray(ev.stats)
    ref_prec = ev.eval["precision"]
    ref_rec = ev.eval["recall"]
    capsys.readouterr()

    ours = CocoDetEval(gt, dts)
    e = ours.accumulate()
    stats = ours.summarize(verbose=False)

    np.testing.assert_allclose(e["precision"], ref_prec, atol=1e-10)
    np.testing.assert_allclose(e["recall"], ref_rec, atol=1e-10)
    np.testing.assert_allclose(stats, ref_stats, atol=1e-10)


def test_cocoeval_empty_detections():
    gt, _ = synth(1, n_gt=10, n_dt=0)
    ours = CocoDetEval(gt, [])
    stats = ours.summarize(verbose=False)
    assert stats[0] == 0.0 or stats[0] == -1.0  # no AP without detections
    assert np.all(stats <= 1.0)


def test_evaluate_files_roundtrip(tmp_path):
    import json

    from icafusion_tpu.eval.cocoeval import evaluate_files
    gt, dts = synth(3, n_img=4, n_gt=20, n_dt=40)
    (tmp_path / "gt.json").write_text(json.dumps(gt))
    (tmp_path / "dt.json").write_text(json.dumps(dts))
    stats, _ = evaluate_files(str(tmp_path / "gt.json"),
                              str(tmp_path / "dt.json"), verbose=False)
    assert stats.shape == (12,) and np.all(stats >= -1) and np.all(stats <= 1)
