"""Test-time augmentation (multi-scale + flip) inference.

Behavioral counterpart of reference Model.forward(augment=True)
(yolo_test.py:115-131) and scale_img (torch_utils.py:237-251):
scales (1, 0.83, 0.67) x flips (none, lr, none); each variant's decoded boxes are
de-scaled/de-flipped back to the input frame and concatenated before NMS.

TPU note: every scale is its own static shape -> 3 compiled programs (cached).
Scaled inputs are padded with 0.447 (ImageNet-mean gray), like the reference.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

TTA_SCALES = (1.0, 0.83, 0.67)
TTA_FLIPS = (None, 3, None)   # 3 = left-right (yolo_test.py:119)


def scale_img(img, ratio: float, gs: int = 32, pad_val: float = 0.447):
    """Resize (bilinear) then pad bottom/right to gs multiples
    (torch_utils.py:237-251). img: (B, H, W, C)."""
    if ratio == 1.0:
        return img
    b, h, w, c = img.shape
    nh, nw = int(h * ratio), int(w * ratio)
    img = jax.image.resize(img, (b, nh, nw, c), method="linear")
    ph = (int(jnp.ceil(nh / gs)) if False else -(-nh // gs)) * gs
    pw = -(-nw // gs) * gs
    return jnp.pad(img, ((0, 0), (0, ph - nh), (0, pw - nw), (0, 0)),
                   constant_values=pad_val)


def tta_inference(model, variables, rgb, ir, gs: int = 32):
    """Decoded predictions (B, sum_N, no) over the TTA ensemble
    (yolo_test.py:116-131)."""
    b, h, w, _ = rgb.shape
    outs: List[jnp.ndarray] = []
    for si, fi in zip(TTA_SCALES, TTA_FLIPS):
        xr, xi = rgb, ir
        if fi == 3:
            xr = xr[:, :, ::-1]
            xi = xi[:, :, ::-1]
        elif fi == 2:
            xr = xr[:, ::-1]
            xi = xi[:, ::-1]
        xr = scale_img(xr, si, gs)
        xi = scale_img(xi, si, gs)
        pred, _, _ = model.apply(variables, xr, xi, train=False, decode=True)
        xy = pred[..., :2] / si
        wh = pred[..., 2:4] / si
        if fi == 2:
            xy = xy.at[..., 1].set(h - xy[..., 1])
        elif fi == 3:
            xy = xy.at[..., 0].set(w - xy[..., 0])
        outs.append(jnp.concatenate([xy, wh, pred[..., 4:]], axis=-1))
    return jnp.concatenate(outs, axis=1)
