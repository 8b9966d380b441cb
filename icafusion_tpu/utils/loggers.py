"""Experiment logging facade: CSV (always) + TensorBoard (when available) + a
no-op remote shim.

Behavioral counterpart of the reference's logging stack (SURVEY §5.5): console +
SummaryWriter (train.py:586) + results.csv + the wandb plumbing
(utils/wandb_logging/, forced offline at train.py:43). The facade keeps the same
three channels: results.csv is written by the fit driver; TensorBoard scalars are
emitted when a writer backend is importable; the remote logger is an explicit
no-op interface for deployments to implement (no vendored wandb)."""

from __future__ import annotations

from pathlib import Path
from typing import Dict


class Loggers:
    def __init__(self, run_dir, enable_tb: bool = True):
        self.run_dir = Path(run_dir)
        self.tb = None
        if enable_tb:
            self.tb = self._make_tb_writer()

    def _make_tb_writer(self):
        try:  # tensorboardX or torch.utils.tensorboard, whichever exists
            from tensorboardX import SummaryWriter  # type: ignore
            return SummaryWriter(str(self.run_dir / "tb"))
        except ImportError:
            pass
        try:
            from torch.utils.tensorboard import SummaryWriter  # type: ignore
            return SummaryWriter(str(self.run_dir / "tb"))
        except Exception:
            return None

    def log_scalars(self, scalars: Dict[str, float], step: int):
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(k, float(v), step)

    def log_image(self, tag: str, img, step: int):
        if self.tb is not None:
            import numpy as np
            arr = np.asarray(img)
            if arr.ndim == 3 and arr.shape[-1] in (1, 3):
                arr = arr.transpose(2, 0, 1)
            self.tb.add_image(tag, arr, step)

    def close(self):
        if self.tb is not None:
            self.tb.close()
