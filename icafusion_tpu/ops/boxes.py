"""Box geometry ops (jnp, fully vectorized; work under jit/vmap/grad).

Behavioral counterparts of reference utils/general.py:
- xywh2xyxy / xyxy2xywh     (general.py:332-350)
- scale_coords / clip_coords (general.py:386-407)
- bbox_iou (incl. GIoU/DIoU/CIoU) (general.py:410-452)
- box_iou pairwise matrix    (general.py:455-477)
- wh_iou                     (general.py:480-485)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def xywh2xyxy(x):
    """(cx, cy, w, h) -> (x1, y1, x2, y2); last-dim 4 (general.py:332-340)."""
    cx, cy, w, h = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy2xywh(x):
    """(x1, y1, x2, y2) -> (cx, cy, w, h) (general.py:322-330)."""
    x1, y1, x2, y2 = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def clip_coords(boxes, img_hw):
    """Clip xyxy boxes to image bounds (general.py:402-407)."""
    h, w = img_hw
    return jnp.stack([
        jnp.clip(boxes[..., 0], 0, w), jnp.clip(boxes[..., 1], 0, h),
        jnp.clip(boxes[..., 2], 0, w), jnp.clip(boxes[..., 3], 0, h)], axis=-1)


def scale_coords(img1_hw, coords, img0_hw, ratio_pad=None):
    """Rescale xyxy coords from letterboxed shape img1 back to native img0
    (general.py:386-399)."""
    if ratio_pad is None:
        gain = min(img1_hw[0] / img0_hw[0], img1_hw[1] / img0_hw[1])
        pad = ((img1_hw[1] - img0_hw[1] * gain) / 2,
               (img1_hw[0] - img0_hw[0] * gain) / 2)
    else:
        gain, pad = ratio_pad[0], ratio_pad[1]
    xy = coords[..., :4]
    xy = xy - jnp.asarray([pad[0], pad[1], pad[0], pad[1]], xy.dtype)
    xy = xy / gain
    return clip_coords(xy, img0_hw)


def bbox_iou(box1, box2, x1y1x2y2: bool = True, GIoU: bool = False,
             DIoU: bool = False, CIoU: bool = False, eps: float = 1e-7):
    """Elementwise IoU between broadcast-compatible box arrays (last dim 4).

    Matches reference utils/general.py:410-452 exactly, including the asymmetric
    eps placement on heights and the detached CIoU alpha (lax.stop_gradient)."""
    if x1y1x2y2:
        b1_x1, b1_y1, b1_x2, b1_y2 = (box1[..., i] for i in range(4))
        b2_x1, b2_y1, b2_x2, b2_y2 = (box2[..., i] for i in range(4))
    else:
        b1_x1, b1_x2 = box1[..., 0] - box1[..., 2] / 2, box1[..., 0] + box1[..., 2] / 2
        b1_y1, b1_y2 = box1[..., 1] - box1[..., 3] / 2, box1[..., 1] + box1[..., 3] / 2
        b2_x1, b2_x2 = box2[..., 0] - box2[..., 2] / 2, box2[..., 0] + box2[..., 2] / 2
        b2_y1, b2_y2 = box2[..., 1] - box2[..., 3] / 2, box2[..., 1] + box2[..., 3] / 2

    inter = (jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0) *
             jnp.clip(jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0))

    w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1 + eps
    w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1 + eps
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    if GIoU or DIoU or CIoU:
        cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)
        ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)
        if CIoU or DIoU:
            c2 = cw ** 2 + ch ** 2 + eps
            rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2 +
                    (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4
            if DIoU:
                return iou - rho2 / c2
            v = (4 / math.pi ** 2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
            alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
            return iou - (rho2 / c2 + v * alpha)
        c_area = cw * ch + eps
        return iou - (c_area - union) / c_area
    return iou


def box_iou(box1, box2):
    """Pairwise IoU matrix (N,4),(M,4) -> (N,M), xyxy (general.py:455-477)."""
    area1 = (box1[:, 2] - box1[:, 0]) * (box1[:, 3] - box1[:, 1])
    area2 = (box2[:, 2] - box2[:, 0]) * (box2[:, 3] - box2[:, 1])
    lt = jnp.maximum(box1[:, None, :2], box2[None, :, :2])
    rb = jnp.minimum(box1[:, None, 2:4], box2[None, :, 2:4])
    inter = jnp.clip(rb - lt, 0).prod(-1)
    return inter / (area1[:, None] + area2[None, :] - inter)


def wh_iou(wh1, wh2):
    """(N,2),(M,2) -> (N,M) IoU of w,h-only boxes (general.py:480-485)."""
    inter = jnp.minimum(wh1[:, None, :], wh2[None, :, :]).prod(-1)
    return inter / (wh1.prod(-1)[:, None] + wh2.prod(-1)[None, :] - inter)
