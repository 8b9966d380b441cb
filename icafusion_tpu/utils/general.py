"""General small utilities (host-side, framework-agnostic).

Behavioral counterparts of the reference's utils/general.py helpers
(reference: utils/general.py:142-147 check_img_size, :198-201 make_divisible,
:244-246 one_cycle, :249-271 colorstr)."""

from __future__ import annotations

import math
import os
import random
import re
from pathlib import Path

import numpy as np


def make_divisible(x: float, divisor: int = 8) -> int:
    """Round channel count up to the nearest multiple of ``divisor``.

    Matches reference utils/general.py:198-201 (math.ceil(x / divisor) * divisor),
    used by the width-multiple scaling in the model parser."""
    return int(math.ceil(x / divisor) * divisor)


def check_img_size(img_size: int, stride: int = 32) -> int:
    """Verify image size is a multiple of the max stride; round up if not.

    Reference: utils/general.py:142-147."""
    new_size = make_divisible(img_size, int(stride))
    if new_size != img_size:
        print(f"WARNING: --img-size {img_size} must be multiple of max stride {stride}, "
              f"updating to {new_size}")
    return new_size


def one_cycle(y1: float = 0.0, y2: float = 1.0, steps: int = 100):
    """Sinusoidal ramp from y1 to y2 over ``steps`` (reference utils/general.py:244-246)."""
    return lambda x: ((1 - math.cos(x * math.pi / steps)) / 2) * (y2 - y1) + y1


def linear_lr(lrf: float, epochs: int):
    """Linear LR lambda used when --linear-lr is set (reference train.py:149-150)."""
    return lambda x: (1 - x / (epochs - 1)) * (1.0 - lrf) + lrf


def init_seeds(seed: int = 0) -> np.random.Generator:
    """Deterministic host-side seeding (reference utils/general.py:45-57).

    Device-side randomness in this framework always flows through explicit
    ``jax.random`` keys, so only python/numpy host RNGs need seeding here."""
    random.seed(seed)
    np.random.seed(seed)
    return np.random.default_rng(seed)


def labels_to_class_weights(labels, nc: int) -> np.ndarray:
    """Inverse-frequency class weights (reference utils/general.py:204-218)."""
    rows = np.concatenate([l for l in labels if len(l)], 0) if any(
        len(l) for l in labels) else np.zeros((0, 5))
    classes = rows[:, 0].astype(int)
    weights = np.bincount(classes, minlength=nc).astype(np.float64)
    weights[weights == 0] = 1
    weights = 1 / weights
    return (weights / weights.sum()).astype(np.float32)


def labels_to_image_weights(labels, nc: int, class_weights=None) -> np.ndarray:
    """Per-image sampling weights from class content (general.py:221-227),
    feeding the --image-weights epoch resampling (train.py:267-278)."""
    if class_weights is None:
        class_weights = np.ones(nc, np.float32)
    counts = np.array([np.bincount(l[:, 0].astype(int), minlength=nc)
                       if len(l) else np.zeros(nc) for l in labels])
    w = (class_weights.reshape(1, nc) * counts).sum(1)
    return w


def colorstr(*input):
    """ANSI color wrapper (reference utils/general.py:249-271)."""
    *args, string = input if len(input) > 1 else ("blue", "bold", input[0])
    colors = {
        "black": "\033[30m", "red": "\033[31m", "green": "\033[32m", "yellow": "\033[33m",
        "blue": "\033[34m", "magenta": "\033[35m", "cyan": "\033[36m", "white": "\033[37m",
        "bright_black": "\033[90m", "bright_red": "\033[91m", "bright_green": "\033[92m",
        "bright_yellow": "\033[93m", "bright_blue": "\033[94m", "bright_magenta": "\033[95m",
        "bright_cyan": "\033[96m", "bright_white": "\033[97m",
        "end": "\033[0m", "bold": "\033[1m", "underline": "\033[4m",
    }
    return "".join(colors[x] for x in args) + f"{string}" + colors["end"]


def increment_path(path, exist_ok: bool = False, sep: str = "") -> Path:
    """runs/exp -> runs/exp{sep}2, runs/exp{sep}3, ... (reference utils/general.py:626-637)."""
    path = Path(path)
    if (path.exists() and exist_ok) or not path.exists():
        return path
    dirs = [str(d) for d in path.parent.glob(f"{path.name}{sep}*")]
    matches = [re.search(rf"%s{sep}(\d+)" % re.escape(path.name), d) for d in dirs]
    i = [int(m.groups()[0]) for m in matches if m]
    n = max(i) + 1 if i else 2
    return Path(f"{path}{sep}{n}")


def get_latest_run(search_dir: str = ".") -> str:
    """Path to most recent 'last.ckpt' in search_dir (reference utils/general.py:60-63)."""
    candidates = list(Path(search_dir).rglob("last.ckpt")) + list(Path(search_dir).rglob("last.msgpack"))
    return str(max(candidates, key=os.path.getctime)) if candidates else ""
