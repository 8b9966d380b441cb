"""Detection metrics (host-side numpy): PR curves, AP, confusion matrix, fitness.

Behavioral counterpart of reference utils/metrics.py:12-185:
- ap_per_class: per-class PR curves sampled on a 1000-point confidence grid,
  101-point COCO interpolation for AP, TP/FP/FN/F1 at the max-F1 threshold
- compute_ap: sentinel-padded precision envelope + interp integration
- fitness: model-selection scalar = mAP@0.5 (weight vector metrics.py:12-15)
- ConfusionMatrix: IoU-matched confusion incl. background row/col
"""

from __future__ import annotations

import numpy as np


def fitness(metrics_row: np.ndarray) -> float:
    """Scalar used for best-checkpoint selection == mAP@0.5
    (metrics.py:12-15: weights [0,0,0,0,0,0,1,0] over
    [tp, fp, fn, f1, mp, mr, map50, map])."""
    w = np.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0])
    return float((np.asarray(metrics_row)[:8] * w).sum())


def compute_ap(recall, precision):
    """AP via 101-point interpolated precision envelope (metrics.py:85-110)."""
    mrec = np.concatenate(([0.0], recall, [recall[-1] + 0.01]))
    mpre = np.concatenate(([1.0], precision, [0.0]))
    mpre = np.flip(np.maximum.accumulate(np.flip(mpre)))
    x = np.linspace(0, 1, 101)
    ap = np.trapezoid(np.interp(x, mrec, mpre), x)
    return ap, mpre, mrec


def ap_per_class(tp, conf, pred_cls, target_cls):
    """Per-class AP over the IoU grid (metrics.py:18-82).

    tp: (n, niou) bool; conf, pred_cls: (n,); target_cls: (m,).
    Returns (tp_count, fp_count, fn_count, p, r, ap, f1, unique_classes) where
    p/r/f1 are at the max-mean-F1 confidence threshold and ap is (nc, niou)."""
    tp = np.asarray(tp)
    conf = np.asarray(conf)
    pred_cls = np.asarray(pred_cls)
    target_cls = np.asarray(target_cls)

    order = np.argsort(-conf)
    tp, conf, pred_cls = tp[order], conf[order], pred_cls[order]

    unique_classes = np.unique(target_cls)
    nc = unique_classes.shape[0]
    niou = tp.shape[1] if tp.ndim == 2 else 1

    px = np.linspace(0, 1, 1000)
    ap = np.zeros((nc, niou))
    p = np.zeros((nc, 1000))
    r = np.zeros((nc, 1000))
    n_l = 0
    for ci, c in enumerate(unique_classes):
        i = pred_cls == c
        n_l = (target_cls == c).sum()
        n_p = int(i.sum())
        if n_p == 0 or n_l == 0:
            continue
        fpc = (1 - tp[i]).cumsum(0)
        tpc = tp[i].cumsum(0)
        recall = tpc / (n_l + 1e-16)
        r[ci] = np.interp(-px, -conf[i], recall[:, 0], left=0)
        precision = tpc / (tpc + fpc)
        p[ci] = np.interp(-px, -conf[i], precision[:, 0], left=1)
        for j in range(niou):
            ap[ci, j], _, _ = compute_ap(recall[:, j], precision[:, j])

    f1 = 2 * p * r / (p + r + 1e-16)
    i = f1.mean(0).argmax()
    # the reference reuses the LAST class's n_l here (metrics.py:78-80) — a quirk
    # meaningful only for nc==1, which is the only case these counts are printed for
    tp_cnt = (r * n_l).round()
    fn_cnt = n_l - tp_cnt
    fp_cnt = (tp_cnt / (p + 1e-16) - tp_cnt).round()
    return (tp_cnt[:, i], fp_cnt[:, i], fn_cnt[:, i], p[:, i], r[:, i], ap,
            f1[:, i], unique_classes.astype(np.int32))


def summarize(stats, nc: int):
    """Aggregate per-image stats -> dict of headline metrics (test.py:288-312).

    stats: list of (correct (n,niou) bool, conf (n,), pred_cls (n,), tcls list)."""
    out = dict(mp=0.0, mr=0.0, map50=0.0, map75=0.0, map=0.0,
               per_class={}, nt=np.zeros(nc, np.int64))
    if not stats:
        return out
    arrs = [np.concatenate([np.asarray(s[k]) for s in stats], 0) for k in range(3)]
    tcls = np.concatenate([np.asarray(s[3]) for s in stats], 0) if stats else np.array([])
    if not len(arrs[0]):
        return out
    tp_c, fp_c, fn_c, p, r, ap, f1, classes = ap_per_class(
        arrs[0], arrs[1], arrs[2], tcls)
    ap50, ap75, ap_mean = ap[:, 0], ap[:, 5], ap.mean(1)
    out.update(mp=float(p.mean()), mr=float(r.mean()), map50=float(ap50.mean()),
               map75=float(ap75.mean()), map=float(ap_mean.mean()))
    for k, c in enumerate(classes):
        out["per_class"][int(c)] = dict(p=float(p[k]), r=float(r[k]),
                                        ap50=float(ap50[k]), ap=float(ap_mean[k]))
    if len(tcls):
        nt = np.bincount(tcls.astype(np.int64), minlength=nc)
        out["nt"] = nt
    return out


class ConfusionMatrix:
    """IoU-matched confusion with background FP/FN row/col (metrics.py:113-185)."""

    def __init__(self, nc: int, conf: float = 0.25, iou_thres: float = 0.45):
        self.matrix = np.zeros((nc + 1, nc + 1), np.int64)
        self.nc = nc
        self.conf = conf
        self.iou_thres = iou_thres

    def process_batch(self, detections: np.ndarray, labels: np.ndarray):
        """detections (N,6) xyxy+conf+cls; labels (M,5) cls+xyxy."""
        detections = detections[detections[:, 4] > self.conf]
        gt_classes = labels[:, 0].astype(int)
        det_classes = detections[:, 5].astype(int)
        if len(labels) and len(detections):
            lt = np.maximum(labels[:, None, 1:3], detections[None, :, 0:2])
            rb = np.minimum(labels[:, None, 3:5], detections[None, :, 2:4])
            inter = np.clip(rb - lt, 0, None).prod(-1)
            a1 = (labels[:, 3] - labels[:, 1]) * (labels[:, 4] - labels[:, 2])
            a2 = (detections[:, 2] - detections[:, 0]) * (detections[:, 3] - detections[:, 1])
            iou = inter / (a1[:, None] + a2[None, :] - inter + 1e-16)
            gi, di = np.where(iou > self.iou_thres)
            matches = np.stack([gi, di, iou[gi, di]], 1)
            if len(matches) > 1:
                matches = matches[matches[:, 2].argsort()[::-1]]
                matches = matches[np.unique(matches[:, 1], return_index=True)[1]]
                matches = matches[matches[:, 2].argsort()[::-1]]
                matches = matches[np.unique(matches[:, 0], return_index=True)[1]]
        else:
            matches = np.zeros((0, 3))
        n = matches.shape[0] > 0
        m0, m1 = matches[:, 0].astype(int), matches[:, 1].astype(int)
        for i, gc in enumerate(gt_classes):
            j = m0 == i
            if n and j.sum() == 1:
                self.matrix[det_classes[m1[j][0]], gc] += 1
            else:
                self.matrix[self.nc, gc] += 1
        if n:
            for i, dc in enumerate(det_classes):
                if not (m1 == i).any():
                    self.matrix[dc, self.nc] += 1
