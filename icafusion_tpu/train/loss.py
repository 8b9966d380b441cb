"""YOLOv5 loss — fully vectorized, fixed-shape JAX port.

Behavioral counterpart of reference utils/loss.py:325-463 (ComputeLoss +
build_targets):

- box loss: mean(1 - CIoU) over assigned candidates          (loss.py:371-375)
- objectness: BCE against an IoU-valued target map; when several candidates land in
  the same cell the highest IoU wins (the reference achieves this by sorting before
  scatter — loss.py:379-382; we use scatter-max, identical for gr=1.0 since the
  written value is monotone in IoU)
- classification: BCE with label smoothing cp/cn             (loss.py:385-388)
- per-level objectness balance [4.0, 1.0, 0.4]               (loss.py:347)
- total = (box*h.box + obj*h.obj + cls*h.cls) * batch_size   (loss.py:400-407)

build_targets (loss.py:409-463) is re-shaped for TPU: instead of ragged per-level
index lists, every (batch, target, anchor, offset) combination is a fixed-shape
candidate with a validity mask:

- anchor filter: max(wh/anchor, anchor/wh) < anchor_t        (loss.py:431-434)
- 3-cell neighbor expansion with g=0.5 offsets               (loss.py:417-443)
- cell indices floor+clamped before computing the box offset (loss.py:452-458;
  the reference's in-place clamp_ mutates gij before tbox is built)

Targets enter as a padded (B, T, 5) array of (cls, x, y, w, h) in 0..1 normalized
image coordinates plus a (B, T) validity mask — no dynamic shapes anywhere.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from icafusion_tpu.config import HypConfig
from icafusion_tpu.ops.boxes import bbox_iou

# neighbor-cell offset table, g=0.5 bias (loss.py:417-421)
_G = 0.5
_OFFSETS = np.array([[0, 0], [1, 0], [0, 1], [-1, 0], [0, -1]], np.float32) * _G


def smooth_bce(eps: float = 0.0) -> Tuple[float, float]:
    """Positive/negative BCE targets for label smoothing (loss.py:15-17)."""
    return 1.0 - 0.5 * eps, 0.5 * eps


def bce_with_logits(logits, targets, pos_weight: float = 1.0):
    """Elementwise BCE-with-logits with torch-style pos_weight on the positive term."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -(pos_weight * targets * log_p + (1.0 - targets) * log_not_p)


def focal_bce_with_logits(logits, targets, gamma: float, pos_weight: float = 1.0,
                          alpha: float = 0.25):
    """FocalLoss wrapper around BCE (loss.py:37-64), 'non-zero' mean reduction
    handled by the caller."""
    loss = bce_with_logits(logits, targets, pos_weight)
    pred_prob = jax.nn.sigmoid(logits)
    p_t = targets * pred_prob + (1 - targets) * (1 - pred_prob)
    alpha_factor = targets * alpha + (1 - targets) * (1 - alpha)
    return loss * alpha_factor * (1.0 - p_t) ** gamma


def qfocal_bce_with_logits(logits, targets, gamma: float,
                           pos_weight: float = 1.0, alpha: float = 0.25):
    """Quality focal loss variant (reference loss.py:67-90) — dormant alternative."""
    loss = bce_with_logits(logits, targets, pos_weight)
    pred_prob = jax.nn.sigmoid(logits)
    alpha_factor = targets * alpha + (1 - targets) * (1 - alpha)
    modulating = jnp.abs(targets - pred_prob) ** gamma
    return loss * alpha_factor * modulating


def bce_blur_with_logits(logits, targets, alpha: float = 0.05,
                         pos_weight: float = 1.0):
    """BCEBlurWithLogitsLoss (reference loss.py:20-34) — dormant alternative
    that down-weights likely missing-label cases: elements where the model is
    confident-positive but the target is 0 (dx = p - t near 1) get their loss
    scaled by 1 - exp((dx-1)/(alpha+1e-4))."""
    loss = bce_with_logits(logits, targets, pos_weight)
    dx = jax.nn.sigmoid(logits) - targets
    return loss * (1.0 - jnp.exp((dx - 1.0) / (alpha + 1e-4)))


def vf_bce_with_logits(logits, targets, gamma: float = 2.0,
                       alpha: float = 0.25, pos_weight: float = 1.0):
    """Varifocal loss (reference loss.py:94-117) — dormant alternative:
    positives (t > 0) keep weight t (IoU-aware quality), negatives get the
    focal weight alpha*|p - t|^gamma."""
    loss = bce_with_logits(logits, targets, pos_weight)
    pred_prob = jax.nn.sigmoid(logits)
    pos = (targets > 0.0).astype(logits.dtype)
    w = targets * pos + alpha * jnp.abs(pred_prob - targets) ** gamma * (1 - pos)
    return loss * w


@dataclasses.dataclass
class YoloLoss:
    """Callable loss. anchors: (nl, na, 2) in *grid units* (pixel/stride —
    yolo_test.py:105). gains: (box, obj, cls) after the nl/nc/imgsz rescale the
    trainer applies (train.py:238-241)."""
    hyp: HypConfig
    nc: int
    anchors: np.ndarray            # (nl, na, 2) grid units
    strides: Tuple[int, ...] = (8, 16, 32)
    gr: float = 1.0                # iou/obj mixing ratio (train.py:249 sets 1.0)
    box_gain: float = 0.05
    obj_gain: float = 1.0
    cls_gain: float = 0.5
    autobalance: bool = False

    def __post_init__(self):
        self.anchors = np.asarray(self.anchors, np.float32)
        self.nl = self.anchors.shape[0]
        self.na = self.anchors.shape[1]
        # per-level obj balance (loss.py:347)
        self.balance = {3: [4.0, 1.0, 0.4]}.get(self.nl, [4.0, 1.0, 0.25, 0.06, 0.02])
        self.cp, self.cn = smooth_bce(self.hyp.label_smoothing)

    def _level_candidates(self, level: int, ny: int, nx: int, targets, mask):
        """All (offset, anchor, target) candidates for one pyramid level.

        Returns flat arrays of length 5*na*M (M = B*T): image idx b, anchor idx a,
        cell (gj, gi), box target (dx, dy, w, h) in grid units, class, validity."""
        B, T, _ = targets.shape
        M = B * T
        t = targets.reshape(M, 5)
        m = mask.reshape(M)
        b_idx = jnp.repeat(jnp.arange(B), T)

        gain = jnp.asarray([nx, ny, nx, ny], jnp.float32)
        gxy = t[:, 1:3] * gain[:2]                   # grid-space centers
        gwh = t[:, 3:5] * gain[2:]                   # grid-space wh
        cls = t[:, 0].astype(jnp.int32)

        anchors = jnp.asarray(self.anchors[level])   # (na, 2)
        r = gwh[None, :, :] / anchors[:, None, :]    # (na, M, 2)
        ratio_ok = jnp.maximum(r, 1.0 / r).max(-1) < self.hyp.anchor_t   # (na, M)
        valid_am = ratio_ok & m[None, :]

        gxi = gain[:2] - gxy
        jk = (jnp.mod(gxy, 1.0) < _G) & (gxy > 1.0)          # (M, 2)
        lm = (jnp.mod(gxi, 1.0) < _G) & (gxi > 1.0)          # (M, 2)
        off_ok = jnp.stack([jnp.ones(M, bool), jk[:, 0], jk[:, 1],
                            lm[:, 0], lm[:, 1]])             # (5, M)

        offs = jnp.asarray(_OFFSETS)                         # (5, 2)
        gij = jnp.floor(gxy[None] - offs[:, None, :])        # (5, M, 2)
        gi = jnp.clip(gij[..., 0], 0, nx - 1)
        gj = jnp.clip(gij[..., 1], 0, ny - 1)
        txy = gxy[None] - jnp.stack([gi, gj], -1)            # (5, M, 2), post-clamp

        # broadcast to (5, na, M)
        valid = off_ok[:, None, :] & valid_am[None, :, :]
        shape5 = (5, self.na, M)
        out = dict(
            b=jnp.broadcast_to(b_idx[None, None], shape5).reshape(-1),
            a=jnp.broadcast_to(jnp.arange(self.na)[None, :, None], shape5).reshape(-1),
            gj=jnp.broadcast_to(gj[:, None, :], shape5).reshape(-1).astype(jnp.int32),
            gi=jnp.broadcast_to(gi[:, None, :], shape5).reshape(-1).astype(jnp.int32),
            txy=jnp.broadcast_to(txy[:, None, :, :], shape5 + (2,)).reshape(-1, 2),
            twh=jnp.broadcast_to(gwh[None, None], shape5 + (2,)).reshape(-1, 2),
            anc=jnp.broadcast_to(anchors[None, :, None, :], shape5 + (2,)).reshape(-1, 2),
            cls=jnp.broadcast_to(cls[None, None], shape5).reshape(-1),
            valid=valid.reshape(-1),
        )
        return out

    def __call__(self, preds: Sequence[jnp.ndarray], targets, mask):
        """preds: nl arrays (B, ny, nx, na, 5+nc); targets (B, T, 5) (cls,xywh norm);
        mask (B, T) bool. Returns (total_loss, items[4]) matching loss.py:400-407."""
        B = preds[0].shape[0]
        lbox = jnp.zeros((), jnp.float32)
        lobj = jnp.zeros((), jnp.float32)
        lcls = jnp.zeros((), jnp.float32)
        use_focal = self.hyp.fl_gamma > 0

        def bce(logits, t, pw):
            if use_focal:
                return focal_bce_with_logits(logits, t, self.hyp.fl_gamma, pw)
            return bce_with_logits(logits, t, pw)

        for i, p in enumerate(preds):
            p = p.astype(jnp.float32)
            _, ny, nx, na, no = p.shape
            c = self._level_candidates(i, ny, nx, targets, mask)
            n_valid = jnp.sum(c["valid"])
            denom = jnp.maximum(n_valid.astype(jnp.float32), 1.0)

            # gather predictions at candidate cells: flat index into (B,ny,nx,na)
            flat = ((c["b"] * ny + c["gj"]) * nx + c["gi"]) * na + c["a"]
            ps = p.reshape(-1, no)[flat]                       # (C, no)

            # box regression (loss.py:371-375)
            pxy = jax.nn.sigmoid(ps[:, 0:2]) * 2.0 - 0.5
            pwh = (jax.nn.sigmoid(ps[:, 2:4]) * 2.0) ** 2 * c["anc"]
            pbox = jnp.concatenate([pxy, pwh], axis=-1)
            tbox = jnp.concatenate([c["txy"], c["twh"]], axis=-1)
            iou = bbox_iou(pbox, tbox, x1y1x2y2=False, CIoU=True)
            lbox += jnp.sum(jnp.where(c["valid"], 1.0 - iou, 0.0)) / denom

            # objectness target map via scatter-max (see module docstring)
            score_iou = jnp.clip(jax.lax.stop_gradient(iou), 0.0)
            tobj_val = (1.0 - self.gr) + self.gr * score_iou
            tobj_val = jnp.where(c["valid"], tobj_val, 0.0)
            tobj = jnp.zeros((B * ny * nx * na,), jnp.float32)
            tobj = tobj.at[flat].max(tobj_val)
            obj_logits = p[..., 4].reshape(-1)
            obji = jnp.mean(bce(obj_logits, tobj, self.hyp.obj_pw))
            lobj += obji * self.balance[i]

            # classification (loss.py:385-388)
            if self.nc > 1:
                tcls = jnp.full((ps.shape[0], self.nc), self.cn, jnp.float32)
                tcls = jnp.where(
                    jax.nn.one_hot(c["cls"], self.nc, dtype=jnp.bool_), self.cp, tcls)
                cls_loss = bce(ps[:, 5:], tcls, self.hyp.cls_pw)
                cls_loss = jnp.where(c["valid"][:, None], cls_loss, 0.0)
                lcls += jnp.sum(cls_loss) / (denom * self.nc)

        lbox *= self.box_gain
        lobj *= self.obj_gain
        lcls *= self.cls_gain
        lrk = jnp.zeros((), jnp.float32)   # ranking-loss slot, disabled (loss.py:391,:403)
        loss = (lbox + lobj + lcls + lrk) * B
        return loss, jnp.stack([lbox, lobj, lcls, lrk])


def pad_targets(label_list: Sequence[np.ndarray], max_targets: int):
    """Host helper: list of per-image (n_i, 5) (cls,x,y,w,h) arrays -> padded
    (B, T, 5) + (B, T) mask. Overflowing targets are dropped highest-index first."""
    B = len(label_list)
    out = np.zeros((B, max_targets, 5), np.float32)
    mask = np.zeros((B, max_targets), bool)
    for i, lab in enumerate(label_list):
        n = min(len(lab), max_targets)
        if n:
            out[i, :n] = lab[:n]
            mask[i, :n] = True
    return out, mask
