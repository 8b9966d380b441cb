"""Batched prefetching loader: dataset -> fixed-shape numpy batches for the TPU.

Behavioral counterpart of the reference's InfiniteDataLoader + collate_fn
(datasets.py:102-155, :1026-1031), redesigned for XLA:

- batches are FIXED SHAPE: images (B, S, S, 3) uint8, targets padded (B, T, 5) with
  a (B, T) validity mask (the reference emits ragged concatenated rows)
- a thread pool decodes/augments ahead (cv2 releases the GIL); the uint8 -> fp /255
  normalization happens on device inside the jitted step (4x cheaper H2D than fp32)
- per-epoch shuffling via a seeded np.random.Generator; each sample gets an
  independent child RNG so results are reproducible regardless of worker timing
  (replaces the reference's global `random` + DataLoader-worker seeding)
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import cv2
import numpy as np

from icafusion_tpu.data.datasets import PairedDetectionDataset

# avoid cv2-internal threads fighting the worker pool (reference general.py:33)
cv2.setNumThreads(0)


@dataclasses.dataclass
class PairedLoader:
    dataset: PairedDetectionDataset
    batch_size: int
    max_targets: int = 64
    shuffle: bool = True
    seed: int = 0
    num_workers: int = 8
    drop_last: bool = True
    prefetch: int = 4
    image_weights: bool = False   # class-aware epoch resampling (train.py:267-278)
    class_weights: Optional[np.ndarray] = None
    # multi-process SPMD: materialize only rows [start, stop) of each global
    # batch — the rows this process's addressable devices own under the data
    # mesh (parallel/mesh.process_batch_slice). The permutation is computed
    # from the shared seed on every process, so ranks agree on the global
    # order with no communication — the reference's DistributedSampler
    # contract (datasets.py:119) without the sampler object. None = all rows.
    local_rows: Optional[tuple] = None

    def __post_init__(self):
        n = len(self.dataset)
        self.steps_per_epoch = n // self.batch_size if self.drop_last else \
            (n + self.batch_size - 1) // self.batch_size
        if self.local_rows is not None:
            lo, hi = self.local_rows
            assert 0 <= lo < hi <= self.batch_size, (self.local_rows,
                                                     self.batch_size)

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        rng = np.random.default_rng(self.seed + epoch)
        n = len(self.dataset)
        if self.image_weights:
            from icafusion_tpu.utils.general import labels_to_image_weights
            nc = self.dataset.nc or 1
            w = labels_to_image_weights(self.dataset.labels, nc,
                                        self.class_weights)
            w = w / max(w.sum(), 1e-9)
            idx = rng.choice(n, size=n, replace=True, p=w)
        else:
            idx = np.arange(n)
            if self.shuffle:
                rng.shuffle(idx)
        if self.drop_last:
            idx = idx[: self.steps_per_epoch * self.batch_size]
        return idx

    def _make_batch(self, indices, epoch: int):
        B = len(indices)
        S = self.dataset.img_size
        rgb = np.empty((B, S, S, 3), np.uint8)
        ir = np.empty((B, S, S, 3), np.uint8)
        targets = np.zeros((B, self.max_targets, 5), np.float32)
        mask = np.zeros((B, self.max_targets), bool)

        def one(slot_idx):
            slot, index = slot_idx
            rng = np.random.default_rng((self.seed, epoch, int(index)))
            r, i2, lab = self.dataset.train_sample(int(index), rng)
            rgb[slot] = r
            ir[slot] = i2
            n = min(len(lab), self.max_targets)
            if n:
                targets[slot, :n] = lab[:n]
                mask[slot, :n] = True

        if self.num_workers > 1:
            with ThreadPoolExecutor(self.num_workers) as ex:
                list(ex.map(one, enumerate(indices)))
        else:
            for si in enumerate(indices):
                one(si)
        return {"rgb": rgb, "ir": ir, "targets": targets, "mask": mask}

    def epoch(self, epoch: int) -> Iterator[dict]:
        """Yield fixed-shape batches for one epoch, prefetching ahead."""
        idx = self._epoch_indices(epoch)
        batches = [idx[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(self.steps_per_epoch)]
        if self.local_rows is not None:
            # per-process shard of every global batch; each sample's augment
            # RNG is keyed on (seed, epoch, dataset index), not slot, so the
            # produced rows are bit-identical to the single-process run's
            lo, hi = self.local_rows
            batches = [b[lo:hi] for b in batches]
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def producer():
            try:
                for b in batches:
                    q.put(self._make_batch(b, epoch))
            finally:
                q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item

    def val_batches(self, use_native: bool = True) -> Iterator[dict]:
        """Fixed-shape eval batches; last batch padded by repeating the final
        sample (extra rows masked out via 'count'). Uses the native C++
        decode+letterbox pipeline when available (JPEG sources only)."""
        from icafusion_tpu.data import native as native_mod

        n = len(self.dataset)
        S = self.dataset.img_size
        B = self.batch_size
        native_ok = (use_native and native_mod.available()
                     and all(p.lower().endswith((".jpg", ".jpeg"))
                             for p in self.dataset.files_rgb[:8]))
        for start in range(0, n, B):
            idx = list(range(start, min(start + B, n)))
            count = len(idx)
            while len(idx) < B:
                idx.append(idx[-1])
            labels = [self.dataset.labels[i].copy() for i in idx]
            if native_ok:
                rgb_paths = [self.dataset.files_rgb[i] for i in idx]
                ir_paths = [self.dataset.files_ir[i] for i in idx]
                try:
                    # scaleup=True matches the reference's combined geometry:
                    # load_image resizes max-side to img_size unconditionally
                    # (datasets.py:1117-1122), then letterbox pads
                    import os
                    rgb, ir, ratios, pads, hw = native_mod.decode_letterbox_batch(
                        rgb_paths, ir_paths, S, scaleup=True,
                        n_threads=max(1, min(self.num_workers,
                                             os.cpu_count() or 1)))
                    shapes = [((int(hw[k, 0]), int(hw[k, 1])),
                               ((float(ratios[k, 0]), float(ratios[k, 1])),
                                (float(pads[k, 0]), float(pads[k, 1]))))
                              for k in range(B)]
                    yield {"rgb": rgb, "ir": ir, "labels": labels,
                           "shapes": shapes, "count": count,
                           "paths": rgb_paths}
                    continue
                except RuntimeError:
                    native_ok = False  # fall back to cv2 for the rest
            rgb = np.empty((B, S, S, 3), np.uint8)
            ir = np.empty((B, S, S, 3), np.uint8)
            shapes = []
            for slot, i in enumerate(idx):
                r, i2, lab, shp = self.dataset.val_sample(i)
                rgb[slot] = r
                ir[slot] = i2
                shapes.append(shp)
            yield {"rgb": rgb, "ir": ir, "labels": labels, "shapes": shapes,
                   "count": count,
                   "paths": [self.dataset.files_rgb[i] for i in idx]}

    def rect_val_batches(self, stride: int = 32,
                         pad: float = 0.5) -> Iterator[dict]:
        """Rect-letterbox eval batches (the reference's val protocol:
        rect=True, pad=0.5 — test.py:100, shape bucketing datasets.py:826-872).

        TPU redesign: instead of the reference's per-batch min/max-aspect
        canvases (variable shapes, one compile each anyway), every image gets
        its per-image pad-0.5 canvas (== the reference's geometry at batch
        size 1, which is how it evaluates during training, train.py:382) and
        images are grouped by canvas — one fixed shape, and therefore one XLA
        compile, per distinct canvas. Single-aspect datasets (KAIST/FLIR)
        produce exactly one group. Batch dicts match val_batches()."""
        n = len(self.dataset)
        B = self.batch_size
        groups: dict = {}
        for i in range(n):
            groups.setdefault(self.dataset.rect_val_canvas(i, stride, pad),
                              []).append(i)
        for (hh, ww), members in groups.items():
            for start in range(0, len(members), B):
                idx = members[start:start + B]
                count = len(idx)
                while len(idx) < B:
                    idx.append(idx[-1])
                rgb = np.empty((B, hh, ww, 3), np.uint8)
                ir = np.empty((B, hh, ww, 3), np.uint8)
                shapes = []
                for slot, i in enumerate(idx):
                    r, i2, _, shp = self.dataset.val_sample(i, canvas=(hh, ww))
                    rgb[slot] = r
                    ir[slot] = i2
                    shapes.append(shp)
                yield {"rgb": rgb, "ir": ir,
                       "labels": [self.dataset.labels[i].copy() for i in idx],
                       "shapes": shapes, "count": count,
                       "paths": [self.dataset.files_rgb[i] for i in idx]}
