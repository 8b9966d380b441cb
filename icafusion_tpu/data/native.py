"""ctypes bindings for the native (C++) host data pipeline.

libicafusion_host.so (native/loader.cpp) decodes paired JPEGs and letterboxes
them straight into fixed-shape uint8 batch buffers with a thread pool — the
serving/eval feed path with zero per-image Python. Built on demand with
native/build.sh; everything falls back to the cv2 path when unavailable.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List

import numpy as np

_LIB_PATH = Path(__file__).resolve().parents[2] / "native" / "libicafusion_host.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    src = _LIB_PATH.parent / "loader.cpp"
    stale = (_LIB_PATH.exists() and src.exists()
             and src.stat().st_mtime > _LIB_PATH.stat().st_mtime)
    if not _LIB_PATH.exists() or stale:
        # (re)build for THIS machine: build.sh uses -march=native, and a stale
        # or foreign-arch binary measured 4.5x slower than a fresh build
        build = _LIB_PATH.parent / "build.sh"
        try:
            subprocess.run(["sh", str(build)], check=True, capture_output=True)
        except Exception:
            if not _LIB_PATH.exists():
                return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    # a stale .so whose rebuild failed must not be bound with the new argument
    # layout — require the ABI the bindings below were written against
    if not hasattr(lib, "icaf_abi_version") or lib.icaf_abi_version() < 2:
        return None
    lib.icaf_decode_letterbox_batch.restype = ctypes.c_int
    lib.icaf_decode_letterbox_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def decode_letterbox_batch(rgb_paths: List[str], ir_paths: List[str],
                           img_size, scaleup: bool = False,
                           n_threads: int = None):
    """-> (rgb (n,H,W,3) u8, ir, ratios (n,2), pads (n,2), orig_hw (n,2)).
    img_size: square int or (H, W) rect canvas (the minimal-rectangle serving
    geometry — cli/detect --rect, ServingEngine(img_size=(512, 640))).
    JPEG-only fast path; raises RuntimeError if the library is unavailable.
    n_threads defaults to min(8, cpu_count) — oversubscribing a small host
    measurably thrashes (BENCH.md)."""
    if n_threads is None:
        import os
        n_threads = max(1, min(8, os.cpu_count() or 1))
    lib = _load()
    if lib is None:
        raise RuntimeError("native host library unavailable; run native/build.sh")
    n = len(rgb_paths)
    H, W = (img_size, img_size) if isinstance(img_size, int) else img_size
    rgb = np.empty((n, H, W, 3), np.uint8)
    ir = np.empty((n, H, W, 3), np.uint8)
    ratios = np.empty((n, 2), np.float32)
    pads = np.empty((n, 2), np.float32)
    hw = np.zeros((n, 2), np.int32)
    c_rgb = (ctypes.c_char_p * n)(*[p.encode() for p in rgb_paths])
    c_ir = (ctypes.c_char_p * n)(*[p.encode() for p in ir_paths])
    ok = lib.icaf_decode_letterbox_batch(
        c_rgb, c_ir, n, H, W, int(scaleup),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ir.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ratios.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pads.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        hw.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n_threads)
    if ok < n:
        bad = [rgb_paths[i] for i in range(n) if hw[i, 0] == 0]
        raise RuntimeError(f"native decode failed for {n - ok} images, e.g. {bad[:3]}")
    return rgb, ir, ratios, pads, hw
