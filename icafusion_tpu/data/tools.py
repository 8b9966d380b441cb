"""Dataset management utilities.

Behavioral counterparts of reference utils/datasets.py:1687-1757:
- autosplit: write train/val/test list files with given ratios
- extract_boxes: crop labelled boxes into a classification dataset
- flatten_recursive: copy a nested tree into one flat directory
"""

from __future__ import annotations

import shutil
from pathlib import Path

import numpy as np

from icafusion_tpu.data.datasets import IMG_FORMATS, img2label_path, parse_label_file


def autosplit(path: str, weights=(0.9, 0.1, 0.0), annotated_only: bool = False,
              seed: int = 0):
    """Split an image dir into autosplit_{train,val,test}.txt (datasets.py:1733-1757)."""
    path = Path(path)
    files = sorted(p for p in path.rglob("*.*")
                   if p.suffix[1:].lower() in IMG_FORMATS)
    rng = np.random.default_rng(seed)
    idx = rng.choice(3, size=len(files), p=list(weights))
    names = ["autosplit_train.txt", "autosplit_val.txt", "autosplit_test.txt"]
    for n in names:
        (path.parent / n).unlink(missing_ok=True)
    for f, i in zip(files, idx):
        if annotated_only and not Path(img2label_path(str(f))).exists():
            continue
        with open(path.parent / names[i], "a") as fh:
            fh.write(f"./{f.relative_to(path.parent)}\n")


def extract_boxes(path: str, out_dir: str = None):
    """Crop labelled boxes into per-class dirs (datasets.py:1705-1730)."""
    import cv2
    path = Path(path)
    out = Path(out_dir) if out_dir else path.parent / "classifier"
    n = 0
    for img_path in sorted(path.rglob("*.*")):
        if img_path.suffix[1:].lower() not in IMG_FORMATS:
            continue
        lab = parse_label_file(img2label_path(str(img_path)))
        if not len(lab):
            continue
        im = cv2.imread(str(img_path))
        h, w = im.shape[:2]
        for j, (c, x, y, bw, bh) in enumerate(lab):
            d = out / str(int(c))
            d.mkdir(parents=True, exist_ok=True)
            # 1.02 pad + minimum margin (datasets.py:1722-1726)
            b = np.array([x * w, y * h, bw * w, bh * h])
            b[2:] = b[2:] * 1.02 + 3
            x1 = int(max(b[0] - b[2] / 2, 0))
            y1 = int(max(b[1] - b[3] / 2, 0))
            x2 = int(min(b[0] + b[2] / 2, w))
            y2 = int(min(b[1] + b[3] / 2, h))
            crop = im[y1:y2, x1:x2]
            if crop.size:
                cv2.imwrite(str(d / f"{img_path.stem}_{j}.jpg"), crop)
                n += 1
    return n


def flatten_recursive(path: str, out_dir: str = None):
    """Copy a nested tree into one flat dir (datasets.py:1695-1702)."""
    path = Path(path)
    out = Path(out_dir) if out_dir else Path(str(path) + "_flat")
    out.mkdir(parents=True, exist_ok=True)
    for f in path.rglob("*.*"):
        if f.is_file():
            shutil.copyfile(f, out / f.name)
    return out
