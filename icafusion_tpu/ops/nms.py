"""Fixed-shape, fully on-device batched NMS.

Behavioral counterpart of reference utils/general.py:518-607 (non_max_suppression):
obj gate -> conf = obj*cls -> optional multi-label expansion -> xywh->xyxy ->
class-offset trick -> greedy IoU suppression -> max_det truncation.

TPU redesign: torchvision.ops.nms is dynamic-shape host/CUDA code; here everything is
static-shape XLA so it jits, vmaps over the batch, and never leaves the device:

1. Candidate scores are computed densely over (N, nc) (multi-label) or (N,) (best
   class), zeroed where below threshold, then reduced to the top ``top_k`` by score.
2. Greedy NMS runs ``max_det`` selection steps of (argmax -> suppress IoU>thresh),
   which is exactly torchvision's keep-order semantics truncated to max_det.

The result is padded to ``max_det`` with a validity mask instead of ragged lists.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from icafusion_tpu.ops.boxes import xywh2xyxy

# class-offset magnitude, matches reference max_wh (general.py:530, :589)
MAX_WH = 4096.0


class Detections(NamedTuple):
    """Fixed-shape NMS output; `valid` marks real rows."""
    boxes: jnp.ndarray    # (..., max_det, 4) xyxy, input-pixel scale
    scores: jnp.ndarray   # (..., max_det)
    classes: jnp.ndarray  # (..., max_det) int32
    valid: jnp.ndarray    # (..., max_det) bool


def _iou_row(box, boxes):
    """IoU of one xyxy box against (K,4) boxes — torchvision convention
    (no +1 on areas)."""
    lt = jnp.maximum(box[:2], boxes[:, :2])
    rb = jnp.minimum(box[2:4], boxes[:, 2:4])
    inter = jnp.clip(rb - lt, 0).prod(-1)
    area1 = (box[2] - box[0]) * (box[3] - box[1])
    area2 = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / (area1 + area2 - inter + 1e-12)


def _iou_matrix(a, b):
    """Pairwise IoU (M,4) x (K,4) -> (M,K), same convention as _iou_row."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:4], b[None, :, 2:4])
    inter = jnp.clip(rb - lt, 0).prod(-1)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / (area_a[:, None] + area_b[None, :] - inter + 1e-12)


def _greedy_nms(boxes_off, scores, iou_thres: float, max_det: int):
    """max_det steps of (pick argmax, suppress IoU > thresh). Returns indices into
    the candidate axis and a per-step validity flag."""
    def step(active, _):
        i = jnp.argmax(active)
        s = active[i]
        iou = _iou_row(boxes_off[i], boxes_off)
        active = jnp.where(iou > iou_thres, -1.0, active)
        active = active.at[i].set(-1.0)
        return active, (i, s > 0.0)

    _, (idx, ok) = jax.lax.scan(step, scores, None, length=max_det)
    return idx, ok


@functools.partial(jax.jit, static_argnames=("conf_thres", "iou_thres", "multi_label",
                                             "agnostic", "max_det", "top_k",
                                             "use_pallas", "merge", "classes"))
def non_max_suppression(prediction, conf_thres: float = 0.25, iou_thres: float = 0.45,
                        multi_label: bool = False, agnostic: bool = False,
                        max_det: int = 300, top_k: int = 4096,
                        use_pallas: bool = None, merge: bool = False,
                        classes: tuple = None) -> Detections:
    """Batched NMS over decoded predictions (B, N, 5+nc) in xywh+obj+cls layout.

    Equivalent to reference general.py:518-607 with fixed shapes. ``top_k`` bounds the
    candidate pool entering suppression (reference max_nms=30000; candidates beyond
    the top 4k by confidence cannot alter the top-300 kept set in practice).

    ``classes`` (a static tuple of class ids) keeps only those classes
    (general.py:574-576). In best-class mode the filter applies AFTER argmax —
    a detection whose best class is excluded is dropped, not reassigned to its
    best allowed class, exactly the reference's row filter.

    ``merge=True`` is the reference's merge-NMS (general.py:594-600): each kept
    box becomes the conf-weighted mean of ALL candidate boxes overlapping it at
    IoU > iou_thres (class-offset space), and non-redundant keeps (matched only
    by themselves) are dropped.

    On TPU the greedy selection loop runs as one Pallas kernel per image
    (kernels/nms.py) — the lax.scan formulation costs ~300 sequential dispatches."""
    b, n, no = prediction.shape
    nc = no - 5
    multi_label = multi_label and nc > 1
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    allowed = None
    if classes is not None:
        mask = np.zeros((nc,), bool)
        mask[list(classes)] = True
        allowed = jnp.asarray(mask)

    def candidates(x):
        obj = x[:, 4]
        cls = x[:, 5:]
        gate = obj > conf_thres                      # candidate gate (general.py:527)
        conf = cls * obj[:, None]                    # conf = obj*cls (general.py:560)
        boxes = xywh2xyxy(x[:, :4])

        if multi_label:
            # dense (N, nc) expansion (general.py:566-568)
            scores_all = jnp.where((conf > conf_thres) & gate[:, None], conf, 0.0)
            if allowed is not None:
                scores_all = jnp.where(allowed[None, :], scores_all, 0.0)
            flat = scores_all.reshape(-1)
            k = min(top_k, flat.shape[0])
            s, fi = jax.lax.top_k(flat, k)
            bi = fi // nc
            ci = (fi % nc).astype(jnp.float32)
        else:
            best = jnp.max(conf, axis=1)
            ci_all = jnp.argmax(conf, axis=1).astype(jnp.float32)
            scores_all = jnp.where((best > conf_thres) & gate, best, 0.0)
            if allowed is not None:
                scores_all = jnp.where(allowed[ci_all.astype(jnp.int32)],
                                       scores_all, 0.0)
            k = min(top_k, n)
            s, bi = jax.lax.top_k(scores_all, k)
            ci = ci_all[bi]

        cand_boxes = boxes[bi]
        offset = 0.0 if agnostic else ci[:, None] * MAX_WH
        boxes_off = cand_boxes + offset
        s = jnp.where(s > 0, s, -1.0)                # padding can never be selected
        return cand_boxes, boxes_off, s, ci

    cand_boxes, boxes_off, s, ci = jax.vmap(candidates)(prediction)

    if use_pallas:
        from icafusion_tpu.kernels.nms import pallas_greedy_nms
        keep, ok = pallas_greedy_nms(boxes_off, s, iou_thres, max_det)
    else:
        keep, ok = jax.vmap(
            lambda bo, sc: _greedy_nms(bo, sc, iou_thres, max_det))(boxes_off, s)

    take = jax.vmap(lambda arr, idx: arr[idx])
    out_boxes = take(cand_boxes, keep)
    out_scores = jnp.clip(take(s, keep), 0.0)
    out_cls = take(ci, keep).astype(jnp.int32)

    if merge:
        def merge_one(kept_off, cand_off, cand_raw, sc, boxes_kept):
            iou = (_iou_matrix(kept_off, cand_off) > iou_thres) \
                & (sc > 0.0)[None, :]                           # (max_det, K); mask padding
            w = iou * jnp.clip(sc, 0.0)[None, :]
            num = w @ cand_raw
            den = jnp.maximum(w.sum(1, keepdims=True), 1e-12)
            merged = num / den
            redundant = iou.sum(1) > 1                          # general.py:599
            return jnp.where(redundant[:, None], merged, boxes_kept), redundant

        kept_off = take(boxes_off, keep)
        out_boxes, redundant = jax.vmap(merge_one)(
            kept_off, boxes_off, cand_boxes, s, out_boxes)
        ok = ok & redundant

    return Detections(out_boxes, out_scores, out_cls, ok)


def batched_nms(boxes, scores, classes, iou_thres: float = 0.45,
                max_det: int = 300, agnostic: bool = False):
    """Lower-level entry: xyxy boxes (K,4) + scores (K,) + int classes (K,).
    Scores <= 0 are treated as padding."""
    offset = 0.0 if agnostic else classes.astype(boxes.dtype)[:, None] * MAX_WH
    s = jnp.where(scores > 0, scores, -1.0)
    keep, ok = _greedy_nms(boxes + offset, s, iou_thres, max_det)
    return keep, ok


def detections_to_numpy(dets: Detections):
    """Host helper: convert one batch of Detections to a list of (n_i, 6) arrays
    [x1,y1,x2,y2,conf,cls] — the reference's output format (general.py:523)."""
    boxes = np.asarray(dets.boxes)
    scores = np.asarray(dets.scores)
    classes = np.asarray(dets.classes)
    valid = np.asarray(dets.valid)
    out = []
    for i in range(boxes.shape[0]):
        m = valid[i]
        out.append(np.concatenate([boxes[i][m], scores[i][m][:, None],
                                   classes[i][m][:, None].astype(np.float32)], axis=1))
    return out


def detections_to_records(dets: Detections, names=None):
    """Pandas-style records per image (Detections.pandas() analog,
    common.py:534-543): list (per image) of dicts with xmin/ymin/xmax/ymax/
    confidence/class/name."""
    out = []
    for arr in detections_to_numpy(dets):
        recs = []
        for x1, y1, x2, y2, conf, cls in arr:
            recs.append({"xmin": float(x1), "ymin": float(y1),
                         "xmax": float(x2), "ymax": float(y2),
                         "confidence": float(conf), "class": int(cls),
                         "name": (names[int(cls)] if names and int(cls) < len(names)
                                  else str(int(cls)))})
        out.append(recs)
    return out
