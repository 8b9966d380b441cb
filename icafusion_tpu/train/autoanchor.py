"""AutoAnchor: anchor-fit check and k-means + genetic-evolution anchor search.

Behavioral counterpart of reference utils/autoanchor.py:
- check_anchors (:23-59): best-possible-recall (BPR) of the dataset's label
  shapes against the model anchors at the training size (with the reference's
  0.9-1.1 random shape jitter); recompute when BPR < 0.98
- kmean_anchors (:103-201): whitened k-means seed, then 1000 generations of
  multiplicative mutation keeping the best anchor-fitness
- metric: ratio-based r = min(wh/anchor, anchor/wh).min over w,h; fitness is the
  mean best-anchor metric over labels above the 1/anchor_t threshold
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def _metric(wh: np.ndarray, anchors: np.ndarray):
    """(n,2) label shapes x (k,2) anchors -> (best ratio metric per label,
    all metrics (n,k)) (autoanchor.py:47-52,:128-132)."""
    r = wh[:, None] / anchors[None]
    x = np.minimum(r, 1 / r).min(2)
    return x.max(1), x


def anchor_fitness(wh: np.ndarray, anchors: np.ndarray, thr: float) -> float:
    """Mean best metric over labels passing the threshold (autoanchor.py:134-137)."""
    best, _ = _metric(wh, anchors)
    return float((best * (best > thr)).mean())


def dataset_shapes(labels: Sequence[np.ndarray], img_shapes: Sequence[Tuple[int, int]],
                   img_size: int, jitter: bool = True,
                   rng: np.random.Generator = None) -> np.ndarray:
    """Label wh in training pixels: normalized wh * per-image letterbox scale
    (autoanchor.py:29-33), with the reference's 0.9-1.1 jitter."""
    rng = rng or np.random.default_rng(0)
    out = []
    for lab, (h, w) in zip(labels, img_shapes):
        if not len(lab):
            continue
        scale = img_size / max(h, w)
        wh = lab[:, 3:5] * np.array([w, h]) * scale
        if jitter:
            wh = wh * rng.uniform(0.9, 1.1, size=(len(wh), 1))
        out.append(wh)
    return np.concatenate(out, 0) if out else np.zeros((0, 2))


def check_anchors(wh: np.ndarray, anchors_px: np.ndarray, thr: float = 4.0):
    """-> (bpr, anchors-above-thr-per-label). Recompute advised when bpr < 0.98
    (autoanchor.py:23-59)."""
    thr = 1.0 / thr
    best, x = _metric(wh, anchors_px.reshape(-1, 2))
    aat = float((x > thr).sum(1).mean())
    bpr = float((best > thr).mean())
    return bpr, aat


def kmean_anchors(wh: np.ndarray, n: int = 9, img_size: int = 640,
                  thr: float = 4.0, gen: int = 1000,
                  seed: int = 0, verbose: bool = False) -> np.ndarray:
    """k-means + GA anchor search (autoanchor.py:103-201). Returns (n,2) anchors
    sorted by area."""
    from scipy.cluster.vq import kmeans

    thr = 1.0 / thr
    rng = np.random.default_rng(seed)
    i = (wh >= 2.0).any(1)  # filter tiny (autoanchor.py:155-157: > 2px in either dim)
    wh = wh[i].astype(np.float64)

    s = wh.std(0)
    k = kmeans(wh / s, n, iter=30, seed=seed)[0] * s
    if len(k) != n:  # degenerate kmeans; random init
        k = wh[rng.integers(0, len(wh), n)]
    k = k[np.argsort(k.prod(1))]

    f = anchor_fitness(wh, k, thr)
    sh = k.shape
    mp, sigma = 0.9, 0.1  # mutation prob/scale (autoanchor.py:185)
    for g in range(gen):
        # zero-mean multiplicative jitter around 1 (autoanchor.py:186-188):
        # mutated entries get 1 + U(0,1)*N(0,1)*sigma so anchors can both
        # shrink and grow; non-mutated entries stay exactly 1
        v = np.ones(sh)
        while (v == 1).all():
            v = ((rng.random(sh) < mp) * rng.random() *
                 rng.standard_normal(sh) * sigma + 1).clip(0.3, 3.0)
        kg = (k * v).clip(min=2.0)
        fg = anchor_fitness(wh, kg, thr)
        if fg > f:
            f, k = fg, kg.copy()
            if verbose and g % 100 == 0:
                print(f"gen {g}: fitness {f:.4f}")
    return k[np.argsort(k.prod(1))].astype(np.float32)


def maybe_autoanchor(dataset, anchors_px: np.ndarray, img_size: int,
                     thr: float = 4.0, bpr_threshold: float = 0.98):
    """check_anchors flow (autoanchor.py:23-59): returns (anchors, recomputed?)."""
    shapes = []
    import cv2
    for p in dataset.files_rgb:
        im = cv2.imread(p)
        shapes.append(im.shape[:2])
    wh = dataset_shapes(dataset.labels, shapes, img_size)
    if not len(wh):
        return anchors_px, False
    bpr, aat = check_anchors(wh, anchors_px, thr)
    print(f"autoanchor: BPR={bpr:.4f}, anchors/target={aat:.2f}")
    if bpr > bpr_threshold:
        return anchors_px, False
    print("autoanchor: BPR below threshold, running k-means+GA...")
    n = int(np.prod(anchors_px.shape[:-1]))
    new = kmean_anchors(wh, n=n, img_size=img_size, thr=thr)
    new_bpr, _ = check_anchors(wh, new, thr)
    if new_bpr > bpr:
        return new.reshape(anchors_px.shape), True
    return anchors_px, False
