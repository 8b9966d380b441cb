"""Streaming inference sources: webcam / video files / RTSP.

Behavioral counterparts of reference utils/datasets.py LoadImages' video branch
(:172-249), LoadWebcam (:252-307) and LoadStreams (:310-388): background reader
threads per source, latest-frame semantics, letterboxed paired output.

Hardware streams are untestable in this environment; the video-file path shares
the same code and is covered by tests.
"""

from __future__ import annotations

import threading
import time
from typing import List, Optional, Tuple

import cv2
import numpy as np

from icafusion_tpu.data.augment import letterbox


class LoadPairedVideos:
    """Iterate two video files (or camera indices) in lockstep, yielding
    letterboxed RGB/IR frame pairs + originals."""

    def __init__(self, source1, source2, img_size: int = 640, stride: int = 32):
        self.caps = [cv2.VideoCapture(int(s) if str(s).isnumeric() else s)
                     for s in (source1, source2)]
        assert all(c.isOpened() for c in self.caps), "failed to open sources"
        self.img_size = img_size

    def __iter__(self):
        return self

    def __next__(self):
        frames = []
        for c in self.caps:
            ok, f = c.read()
            if not ok:
                raise StopIteration
            frames.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
        lbs = [letterbox(f, self.img_size, scaleup=True)[0] for f in frames]
        return lbs[0], lbs[1], frames[0], frames[1]

    def release(self):
        for c in self.caps:
            c.release()


class LoadPairedStreams:
    """Threaded multi-stream reader (RTSP/webcam), latest-frame semantics
    (LoadStreams, datasets.py:310-388)."""

    def __init__(self, sources1: List, sources2: List, img_size: int = 640,
                 fps: float = 0.0):
        """fps > 0 paces the readers (sleep 1/fps between grabs) — real
        cameras pace themselves; use this when replaying FILES as streams so
        they don't drain at decode speed."""
        assert len(sources1) == len(sources2)
        self.img_size = img_size
        self.frame_interval = 1.0 / fps if fps > 0 else 0.0
        self.frames: List[Optional[Tuple[np.ndarray, np.ndarray]]] = \
            [None] * len(sources1)
        # per-stream frame sequence number: lets consumers distinguish a fresh
        # frame from a stale one after EOF/disconnect (the reader keeps the
        # last frame, like the reference's LoadStreams, datasets.py:310-388)
        self.seq: List[int] = [0] * len(sources1)
        self.caps = []
        self.threads = []
        self.running = True
        for i, (s1, s2) in enumerate(zip(sources1, sources2)):
            c1 = cv2.VideoCapture(int(s1) if str(s1).isnumeric() else s1)
            c2 = cv2.VideoCapture(int(s2) if str(s2).isnumeric() else s2)
            assert c1.isOpened() and c2.isOpened(), f"failed to open stream {i}"
            self.caps.append((c1, c2))
            t = threading.Thread(target=self._reader, args=(i,), daemon=True)
            t.start()
            self.threads.append(t)

    def _reader(self, i):
        c1, c2 = self.caps[i]
        while self.running:
            ok1, f1 = c1.read()
            ok2, f2 = c2.read()
            if ok1 and ok2:
                self.frames[i] = (cv2.cvtColor(f1, cv2.COLOR_BGR2RGB),
                                  cv2.cvtColor(f2, cv2.COLOR_BGR2RGB))
                self.seq[i] += 1
                if self.frame_interval:
                    time.sleep(self.frame_interval)
            else:
                time.sleep(0.01)

    def read(self):
        """Latest letterboxed frame pairs for all streams (None until first frame)."""
        out = []
        for fr in self.frames:
            if fr is None:
                out.append(None)
                continue
            r = letterbox(fr[0], self.img_size, scaleup=True)[0]
            i = letterbox(fr[1], self.img_size, scaleup=True)[0]
            out.append((r, i, fr[0], fr[1]))
        return out

    def close(self):
        self.running = False
        for c1, c2 in self.caps:
            c1.release()
            c2.release()
