"""Loss parity: the fixed-shape JAX loss must match a ragged numpy oracle that
independently implements the reference algorithm (utils/loss.py:325-463)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from icafusion_tpu.config import load_hyp_config
from icafusion_tpu.train.loss import YoloLoss, pad_targets

ANCHORS_PX = np.array([[[10, 13], [16, 30], [33, 23]],
                       [[30, 61], [62, 45], [59, 119]],
                       [[116, 90], [156, 198], [373, 326]]], np.float32)
STRIDES = (8, 16, 32)
ANCHORS = ANCHORS_PX / np.array(STRIDES, np.float32)[:, None, None]


def np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def np_bce(logits, t, pw=1.0):
    logp = -np.logaddexp(0, -logits)
    lognotp = -np.logaddexp(0, logits)
    return -(pw * t * logp + (1 - t) * lognotp)


def np_ciou(pbox, tbox, eps=1e-7):
    """CIoU for xywh boxes, matching general.py:410-452."""
    b1x1, b1x2 = pbox[:, 0] - pbox[:, 2] / 2, pbox[:, 0] + pbox[:, 2] / 2
    b1y1, b1y2 = pbox[:, 1] - pbox[:, 3] / 2, pbox[:, 1] + pbox[:, 3] / 2
    b2x1, b2x2 = tbox[:, 0] - tbox[:, 2] / 2, tbox[:, 0] + tbox[:, 2] / 2
    b2y1, b2y2 = tbox[:, 1] - tbox[:, 3] / 2, tbox[:, 1] + tbox[:, 3] / 2
    inter = (np.clip(np.minimum(b1x2, b2x2) - np.maximum(b1x1, b2x1), 0, None) *
             np.clip(np.minimum(b1y2, b2y2) - np.maximum(b1y1, b2y1), 0, None))
    w1, h1 = b1x2 - b1x1, b1y2 - b1y1 + eps
    w2, h2 = b2x2 - b2x1, b2y2 - b2y1 + eps
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    cw = np.maximum(b1x2, b2x2) - np.minimum(b1x1, b2x1)
    ch = np.maximum(b1y2, b2y2) - np.minimum(b1y1, b2y1)
    c2 = cw ** 2 + ch ** 2 + eps
    rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2 + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4
    v = (4 / math.pi ** 2) * (np.arctan(w2 / h2) - np.arctan(w1 / h1)) ** 2
    alpha = v / (v - iou + (1 + eps))
    return iou - (rho2 / c2 + v * alpha)


def np_reference_loss(preds, targets_rows, hyp, nc, gains=(0.05, 1.0, 0.5), gr=1.0):
    """Numpy oracle of ComputeLoss.__call__ + build_targets (ragged, per reference).

    preds: list of (B, ny, nx, na, no) arrays (our NHWC-ish layout).
    targets_rows: (nt, 6) [img, cls, x, y, w, h] normalized."""
    na, nl = 3, 3
    balance = [4.0, 1.0, 0.4]
    g = 0.5
    off = np.array([[0, 0], [1, 0], [0, 1], [-1, 0], [0, -1]], np.float32) * g
    B = preds[0].shape[0]
    nt = len(targets_rows)
    lbox = lobj = lcls = 0.0
    cp, cn = 1.0, 0.0

    t_rep = np.concatenate(
        [np.tile(targets_rows, (na, 1, 1)),
         np.tile(np.arange(na, dtype=np.float32)[:, None, None], (1, nt, 1))], 2)

    for i in range(nl):
        p = preds[i]
        _, ny, nx, _, no = p.shape
        anchors = ANCHORS[i]
        gain = np.ones(7, np.float32)
        gain[2:6] = [nx, ny, nx, ny]
        t = t_rep * gain
        if nt:
            r = t[:, :, 4:6] / anchors[:, None]
            j = np.maximum(r, 1 / r).max(2) < hyp.anchor_t
            t = t[j]
            gxy = t[:, 2:4]
            gxi = gain[2:4] - gxy
            jj, kk = ((gxy % 1 < g) & (gxy > 1)).T
            ll, mm = ((gxi % 1 < g) & (gxi > 1)).T
            sel = np.stack([np.ones_like(jj), jj, kk, ll, mm])
            t5 = np.tile(t, (5, 1, 1))[sel]
            offsets = (np.zeros_like(gxy)[None] + off[:, None])[sel]
        else:
            t5 = np.zeros((0, 7), np.float32)
            offsets = 0

        b = t5[:, 0].astype(int)
        c = t5[:, 1].astype(int)
        gxy = t5[:, 2:4]
        gwh = t5[:, 4:6]
        gij = (gxy - offsets).astype(int)
        gi = np.clip(gij[:, 0], 0, nx - 1)
        gj = np.clip(gij[:, 1], 0, ny - 1)
        a = t5[:, 6].astype(int)

        tobj = np.zeros((B, ny, nx, na), np.float32)
        n = len(b)
        if n:
            ps = p[b, gj, gi, a]
            pxy = np_sigmoid(ps[:, :2]) * 2 - 0.5
            pwh = (np_sigmoid(ps[:, 2:4]) * 2) ** 2 * anchors[a]
            pbox = np.concatenate([pxy, pwh], 1)
            tbox = np.concatenate([gxy - np.stack([gi, gj], 1), gwh], 1)
            iou = np_ciou(pbox, tbox)
            lbox += (1.0 - iou).mean()
            score = np.clip(iou, 0, None)
            order = np.argsort(score, kind="stable")  # sort_obj_iou (loss.py:379-381)
            for k in order:
                tobj[b[k], gj[k], gi[k], a[k]] = (1.0 - gr) + gr * score[k]
            if nc > 1:
                tc = np.full((n, nc), cn, np.float32)
                tc[np.arange(n), c] = cp
                lcls += np_bce(ps[:, 5:], tc).mean()
        lobj += np_bce(p[..., 4], tobj).mean() * balance[i]

    lbox *= gains[0]
    lobj *= gains[1]
    lcls *= gains[2]
    return (lbox + lobj + lcls) * B, np.array([lbox, lobj, lcls, 0.0])


def make_case(seed, B=2, nt_per=5, nc=3, imgsz=64):
    rng = np.random.default_rng(seed)
    grids = [imgsz // s for s in STRIDES]
    preds = [rng.normal(0, 1, (B, gy, gy, 3, 5 + nc)).astype(np.float32)
             for gy in grids]
    labels = []
    for i in range(B):
        n = rng.integers(1, nt_per + 1)
        cls = rng.integers(0, nc, n).astype(np.float32)
        xy = rng.uniform(0.05, 0.95, (n, 2))
        wh = rng.uniform(0.03, 0.6, (n, 2))
        labels.append(np.concatenate([cls[:, None], xy, wh], 1).astype(np.float32))
    rows = np.concatenate(
        [np.concatenate([np.full((len(l), 1), i, np.float32), l], 1)
         for i, l in enumerate(labels)])
    return preds, labels, rows


import jax

_LOSS = YoloLoss(hyp=load_hyp_config(), nc=3, anchors=ANCHORS)


@jax.jit
def _jit_loss(preds, targets, mask):
    return _LOSS(preds, targets, mask)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_loss_matches_numpy_oracle(seed):
    hyp = load_hyp_config()
    preds, labels, rows = make_case(seed)
    targets, mask = pad_targets(labels, max_targets=8)
    loss, items = _jit_loss([jnp.asarray(p) for p in preds],
                            jnp.asarray(targets), jnp.asarray(mask))
    ref_loss, ref_items = np_reference_loss(preds, rows, hyp, nc=3)
    np.testing.assert_allclose(np.asarray(items), ref_items, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(loss), ref_loss, rtol=2e-4)


def test_loss_no_targets():
    preds, labels, rows = make_case(0)
    targets, mask = pad_targets([np.zeros((0, 5), np.float32)] * 2, max_targets=8)
    loss, items = _jit_loss([jnp.asarray(p) for p in preds],
                            jnp.asarray(targets), jnp.asarray(mask))
    assert float(items[0]) == 0.0 and float(items[2]) == 0.0
    assert float(items[1]) > 0.0  # objectness still penalizes false positives
    assert np.isfinite(float(loss))


def test_loss_is_differentiable():
    preds, labels, rows = make_case(1)
    targets, mask = pad_targets(labels, max_targets=8)

    def f(ps):
        return _LOSS(ps, jnp.asarray(targets), jnp.asarray(mask))[0]

    grads = jax.jit(jax.grad(f))([jnp.asarray(p) for p in preds])
    for gp in grads:
        g = np.asarray(gp)
        assert np.isfinite(g).all()
        assert np.abs(g).sum() > 0


def test_loss_variant_torch_parity():
    """bce_blur / vf loss variants match the reference's torch formulations
    (loss.py:20-34 BCEBlurWithLogitsLoss, :94-117 VFLoss) elementwise."""
    import torch

    from icafusion_tpu.train.loss import bce_blur_with_logits, vf_bce_with_logits

    rng = np.random.default_rng(0)
    logits = rng.normal(0, 2, (64, 5)).astype(np.float32)
    # targets mix hard 0/1 with soft IoU-quality values (VFL's positive case)
    targets = np.where(rng.random((64, 5)) < 0.5, 0.0,
                       rng.uniform(0.2, 1.0, (64, 5))).astype(np.float32)
    tl, tt = torch.tensor(logits), torch.tensor(targets)
    base = torch.nn.functional.binary_cross_entropy_with_logits(
        tl, tt, reduction="none")

    dx = torch.sigmoid(tl) - tt
    want_blur = base * (1 - torch.exp((dx - 1) / (0.05 + 1e-4)))
    got_blur = np.asarray(bce_blur_with_logits(jnp.asarray(logits),
                                               jnp.asarray(targets)))
    np.testing.assert_allclose(got_blur, want_blur.numpy(), rtol=1e-5, atol=1e-6)

    p = torch.sigmoid(tl)
    w = tt * (tt > 0).float() + 0.25 * (p - tt).abs() ** 2.0 * (tt <= 0).float()
    got_vf = np.asarray(vf_bce_with_logits(jnp.asarray(logits),
                                           jnp.asarray(targets)))
    np.testing.assert_allclose(got_vf, (base * w).numpy(), rtol=1e-5, atol=1e-6)


def test_shift_augment():
    """shift_augment translates content and fills vacated edges with gray
    (datasets.py:1061-1078); shift magnitude bounded by max_shift."""
    from icafusion_tpu.data.augment import shift_augment

    img = np.arange(32 * 32 * 3, dtype=np.uint8).reshape(32, 32, 3)
    out = shift_augment(img, np.random.default_rng(1), max_shift=5)
    assert out.shape == img.shape and out.dtype == img.dtype
    # the interior must be a pure translate of the source: some offset
    # |dx|,|dy| <= 5 reproduces the original exactly outside the fill band
    found = False
    for dy in range(-5, 6):
        for dx in range(-5, 6):
            ty = slice(max(-dy, 0), 32 + min(-dy, 0))
            tx = slice(max(-dx, 0), 32 + min(-dx, 0))
            sy = slice(max(dy, 0), 32 + min(dy, 0))
            sx = slice(max(dx, 0), 32 + min(dx, 0))
            if np.array_equal(out[ty, tx], img[sy, sx]) and (dx or dy):
                found = True
    fixed = shift_augment(img, np.random.default_rng(2), max_shift=0)
    assert found or np.array_equal(out, img)
    assert np.array_equal(fixed, img)  # zero shift is identity
