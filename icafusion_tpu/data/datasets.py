"""Paired RGB/IR detection dataset — host side.

Behavioral counterpart of reference utils/datasets.py:690-1057
(LoadMultiModalImagesAndLabels):

- RGB and IR file lists discovered separately from dir / txt-list / glob paths
  (datasets.py:711-741); pairs are index-aligned
- label paths derived by replacing the 'visible'/'infrared' path component with
  'labels' and the extension with .txt (img2label_paths, datasets.py:391-401);
  an 'images' component also maps to 'labels' for generic layouts
- labels come from the RGB side only (datasets.py:878,:973-978)
- per-file label parsing with the reference's validation asserts
  (cache_labels, datasets.py:882-937): 5 columns, normalized <=1, non-negative,
  duplicate rows removed
- label cache: a single .npz keyed by a hash of paths+mtimes
  (datasets.py:748-785), no torch pickle

Train samples: mosaic (prob hyp.mosaic) or letterbox path, HSV per modality,
paired flips with one coin (datasets.py:948-1024). Val samples: square letterbox,
scaleup=False, with (h0,w0)/(ratio,pad) shapes for mAP rescaling.

TPU note: the reference's rect-training shape bucketing (datasets.py:826-872)
produces per-batch variable shapes — hostile to XLA. We evaluate at a fixed square
size instead; parity at the metric level is covered by the eval harness tests.
"""

from __future__ import annotations

import dataclasses
import glob
import hashlib
import os
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np

from icafusion_tpu.config import HypConfig
from icafusion_tpu.data.augment import (augment_hsv, letterbox, mosaic_pair,
                                        xywhn2xyxy, xyxy2xywhn)

IMG_FORMATS = {"bmp", "jpg", "jpeg", "png", "tif", "tiff", "dng", "webp", "mpo"}


def discover_images(path: str) -> List[str]:
    """dir / txt-list / glob discovery (datasets.py:711-741)."""
    files: List[str] = []
    p = Path(path)
    if p.is_dir():
        files = sorted(str(x) for x in p.rglob("*.*"))
    elif p.is_file() and p.suffix == ".txt":
        parent = str(p.parent) + os.sep
        with open(p) as f:
            lines = [x.strip() for x in f.read().splitlines() if x.strip()]
        files = [x.replace("./", parent) if x.startswith("./") else x for x in lines]
    else:
        files = sorted(glob.glob(path, recursive=True))
    files = [f for f in files if f.rsplit(".", 1)[-1].lower() in IMG_FORMATS]
    if not files:
        raise FileNotFoundError(f"no images found in {path}")
    return files


def img2label_path(img_path: str) -> str:
    """Replace the visible/infrared/images dir with labels, ext with .txt
    (datasets.py:391-401)."""
    parts = img_path.split(os.sep)
    src = None
    for cand in ("visible", "infrared", "images"):
        if cand in parts:
            src = cand
            break
    if src is None:
        # fall back: label next to image
        return str(Path(img_path).with_suffix(".txt"))
    path = img_path.replace(os.sep + src + os.sep, os.sep + "labels" + os.sep, 1)
    return str(Path(path).with_suffix(".txt"))


def parse_label_file(path: str, nc: Optional[int] = None) -> np.ndarray:
    """(n,5) [cls, x, y, w, h] normalized; validation per cache_labels
    (datasets.py:896-913)."""
    if not os.path.isfile(path):
        return np.zeros((0, 5), np.float32)
    with open(path) as f:
        rows = [x.split() for x in f.read().strip().splitlines() if len(x)]
    if not rows:
        return np.zeros((0, 5), np.float32)
    lab = np.array(rows, dtype=np.float32)
    assert lab.shape[1] == 5, f"labels require 5 columns each: {path}"
    assert (lab >= 0).all(), f"negative labels: {path}"
    assert (lab[:, 1:] <= 1).all(), f"non-normalized or out of bounds coordinates: {path}"
    uniq = np.unique(lab, axis=0)
    if len(uniq) < len(lab):
        lab = uniq
    if nc is not None:
        assert (lab[:, 0] < nc).all(), f"label class exceeds nc={nc}: {path}"
    return lab


def _list_hash(paths: Sequence[str]) -> str:
    h = hashlib.sha1()
    for p in paths:
        h.update(p.encode())
        try:
            h.update(str(os.path.getmtime(p)).encode())
        except OSError:
            pass
    return h.hexdigest()


@dataclasses.dataclass
class PairedDetectionDataset:
    """Index-aligned paired RGB/IR images + RGB-side labels."""
    path_rgb: str
    path_ir: str
    img_size: int = 640
    hyp: HypConfig = dataclasses.field(default_factory=HypConfig)
    augment: bool = False
    nc: Optional[int] = None
    cache_dir: Optional[str] = None
    single_cls: bool = False   # collapse every label to class 0 (reference
    # --single-cls: datasets.py:393 `if single_cls: x[:, 0] = 0`)

    def __post_init__(self):
        self.files_rgb = discover_images(self.path_rgb)
        self.files_ir = discover_images(self.path_ir)
        assert len(self.files_rgb) == len(self.files_ir), (
            f"paired counts differ: {len(self.files_rgb)} rgb vs "
            f"{len(self.files_ir)} ir")
        self.label_files = [img2label_path(p) for p in self.files_rgb]
        self.labels = self._load_labels()
        self.indices = np.arange(len(self.files_rgb))

    def __len__(self):
        return len(self.files_rgb)

    # ---------------- labels ----------------

    def _load_labels(self) -> List[np.ndarray]:
        cache_path = None
        if self.cache_dir is not None:
            key = _list_hash(self.files_rgb + self.label_files)
            cache_path = Path(self.cache_dir) / f"labels_{key}.npz"
            if cache_path.is_file():
                z = np.load(cache_path, allow_pickle=False)
                labels = [z[f"l{i}"] for i in range(len(self.files_rgb))]
                # the cache may have been written by a single_cls run (parsed
                # with the class<nc assert skipped); re-validate class ids
                # against THIS run's nc so out-of-range ids never reach
                # training (reference assert, train.py:205-207)
                if self.nc is not None and not self.single_cls:
                    for lab, lp in zip(labels, self.label_files):
                        assert not len(lab) or lab[:, 0].max() < self.nc, (
                            f"label class exceeds nc={self.nc} in {lp} "
                            "(cached labels)")
                return self._collapse(labels)
        # single_cls parses without the class<nc assert (raw files keep their
        # original multi-class ids), then collapses to 0 below
        labels = [parse_label_file(p, None if self.single_cls else self.nc)
                  for p in self.label_files]
        if cache_path is not None:
            cache_path.parent.mkdir(parents=True, exist_ok=True)
            np.savez(cache_path, **{f"l{i}": l for i, l in enumerate(labels)})
        return self._collapse(labels)

    def _collapse(self, labels: List[np.ndarray]) -> List[np.ndarray]:
        """single_cls: every object becomes class 0 (applied after the cache,
        so the cache stays class-full and shareable with multi-class runs)."""
        if self.single_cls:
            for l in labels:
                if len(l):
                    l[:, 0] = 0
        return labels

    def class_histogram(self) -> np.ndarray:
        nc = self.nc or int(max((l[:, 0].max() for l in self.labels if len(l)),
                                default=0) + 1)
        h = np.zeros(nc, np.int64)
        for l in self.labels:
            if len(l):
                np.add.at(h, l[:, 0].astype(int), 1)
        return h

    # ---------------- image IO ----------------

    def _load_pair(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        """Load + max-side resize to img_size (load_image_rgb_ir,
        datasets.py:1097-1125). Returns HWC RGB uint8 pair."""
        img_rgb = cv2.imread(self.files_rgb[index])
        img_ir = cv2.imread(self.files_ir[index])
        assert img_rgb is not None, f"Image RGB Not Found {self.files_rgb[index]}"
        assert img_ir is not None, f"Image IR Not Found {self.files_ir[index]}"
        img_rgb = cv2.cvtColor(img_rgb, cv2.COLOR_BGR2RGB)
        img_ir = cv2.cvtColor(img_ir, cv2.COLOR_BGR2RGB)
        h0, w0 = img_rgb.shape[:2]
        r = self.img_size / max(h0, w0)
        if r != 1:
            interp = cv2.INTER_AREA if r < 1 and not self.augment else cv2.INTER_LINEAR
            img_rgb = cv2.resize(img_rgb, (int(w0 * r), int(h0 * r)), interpolation=interp)
            img_ir = cv2.resize(img_ir, (int(w0 * r), int(h0 * r)), interpolation=interp)
        self._last_hw0 = (h0, w0)
        return img_rgb, img_ir

    # ---------------- samples ----------------

    def train_sample(self, index: int, rng: np.random.Generator):
        """One augmented pair: (rgb u8 HWC, ir u8 HWC, labels (n,5) cls+xywh-norm).
        Mirrors __getitem__ (datasets.py:948-1024)."""
        hyp = self.hyp
        use_mosaic = self.augment and rng.random() < hyp.mosaic
        if use_mosaic:
            img_rgb, img_ir, t_xyxy = mosaic_pair(
                self._load_pair, index, self.indices, self.img_size,
                lambda i: self.labels[i], rng, hyp)
        else:
            img_rgb, img_ir = self._load_pair(index)
            h, w = img_rgb.shape[:2]
            img_rgb, ratio, pad = letterbox(img_rgb, self.img_size, scaleup=self.augment)
            img_ir, _, _ = letterbox(img_ir, self.img_size, scaleup=self.augment)
            lab = self.labels[index]
            t_xyxy = np.zeros((0, 5), np.float32)
            if lab.size:
                t_xyxy = np.empty_like(lab)
                t_xyxy[:, 0] = lab[:, 0]
                t_xyxy[:, 1:] = xywhn2xyxy(lab[:, 1:], ratio[0] * w, ratio[1] * h,
                                           padw=pad[0], padh=pad[1])

        if self.augment:
            augment_hsv(img_rgb, rng, hyp.hsv_h, hyp.hsv_s, hyp.hsv_v)
            augment_hsv(img_ir, rng, hyp.hsv_h, hyp.hsv_s, hyp.hsv_v)

        H, W = img_rgb.shape[:2]
        labels = np.zeros((len(t_xyxy), 5), np.float32)
        if len(t_xyxy):
            labels[:, 0] = t_xyxy[:, 0]
            labels[:, 1:] = xyxy2xywhn(t_xyxy[:, 1:], W, H)

        if self.augment:
            if rng.random() < hyp.flipud:
                img_rgb = np.flipud(img_rgb)
                img_ir = np.flipud(img_ir)
                if len(labels):
                    labels[:, 2] = 1 - labels[:, 2]
            if rng.random() < hyp.fliplr:
                img_rgb = np.fliplr(img_rgb)
                img_ir = np.fliplr(img_ir)
                if len(labels):
                    labels[:, 1] = 1 - labels[:, 1]
        return np.ascontiguousarray(img_rgb), np.ascontiguousarray(img_ir), labels

    def val_sample(self, index: int, canvas=None):
        """Letterboxed pair, scaleup=False, plus shapes info for coordinate
        rescaling (test.py uses (h0,w0),((r,r),pad)). canvas: target (h, w) —
        defaults to the fixed square img_size; rect eval passes the per-image
        pad-0.5 canvas from rect_val_canvas()."""
        img_rgb, img_ir = self._load_pair(index)
        h, w = img_rgb.shape[:2]
        h0, w0 = self._last_hw0
        canvas = self.img_size if canvas is None else canvas
        img_rgb, ratio, pad = letterbox(img_rgb, canvas, scaleup=False)
        img_ir, _, _ = letterbox(img_ir, canvas, scaleup=False)
        lab = self.labels[index]
        shapes = ((h0, w0), ((h / h0 * ratio[0], w / w0 * ratio[1]), pad))
        return (np.ascontiguousarray(img_rgb), np.ascontiguousarray(img_ir),
                lab.copy(), shapes)

    # ---------------- rect eval geometry ----------------

    def image_shapes(self) -> np.ndarray:
        """(n, 2) native (h0, w0) per image, from header reads (PIL), cached."""
        if getattr(self, "_image_shapes", None) is None:
            from PIL import Image
            shapes = np.empty((len(self.files_rgb), 2), np.int64)
            for i, p in enumerate(self.files_rgb):
                with Image.open(p) as im:
                    w0, h0 = im.size
                shapes[i] = (h0, w0)
            self._image_shapes = shapes
        return self._image_shapes

    def rect_val_canvas(self, index: int, stride: int = 32,
                        pad: float = 0.5) -> Tuple[int, int]:
        """The reference's rect-val canvas for one image (datasets.py:826-872
        at its eval geometry): aspect ratio normalized to max side 1, scaled
        by img_size, ceil'd to stride multiples with +pad slack."""
        h0, w0 = self.image_shapes()[index]
        ar = h0 / w0
        shape = [ar, 1.0] if ar < 1 else [1.0, 1.0 / ar]
        canvas = np.ceil(np.array(shape) * self.img_size / stride
                         + pad).astype(int) * stride
        return int(canvas[0]), int(canvas[1])
