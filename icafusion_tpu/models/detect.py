"""Anchor-based YOLO Detect head with on-device decode.

Behavioral counterpart of reference models/yolo_test.py:26-70:
- per-level 1x1 conv to na*(nc+5) channels (yolo_test.py:40)
- raw train output per level, laid out (b, ny, nx, na, no) here (NHWC-natural;
  the reference uses (b, na, ny, nx, no) — yolo_test.py:51)
- inference decode (yolo_test.py:59-63):
    xy = (sigmoid(t_xy) * 2 - 0.5 + grid) * stride
    wh = (sigmoid(t_wh) * 2) ** 2 * anchor_pixels
  plus the raw class logits stream that feeds Grad-CAM (yolo_test.py:57,:63).

Grids are generated inline with broadcasted_iota — static shapes, nothing cached.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def default_strides(nl: int) -> Tuple[int, ...]:
    """P3..P{3+nl-1} strides. The reference hardcodes [8,16,32] (yolo_test.py:104);
    we generalize to 4-/5-level hub configs."""
    return tuple(8 * (2 ** i) for i in range(nl))


def check_anchor_order(anchors: np.ndarray, strides: Sequence[int]) -> np.ndarray:
    """Flip anchor levels if their area order disagrees with stride order
    (reference utils/autoanchor.py:12-19). anchors: (nl, na, 2) in pixels."""
    a = anchors.reshape(len(strides), -1, 2)
    da = a.prod(-1).mean(-1)[-1] - a.prod(-1).mean(-1)[0]
    ds = strides[-1] - strides[0]
    if np.sign(da) != np.sign(ds):
        a = a[::-1]
    return a


class Detect(nn.Module):
    """YOLOv5 detection head (see module docstring)."""
    nc: int
    anchors: Tuple[Tuple[float, ...], ...]  # (nl, na*2) pixel anchors, stride-ordered
    ch: Tuple[int, ...]                     # input channels per level
    strides: Tuple[int, ...] = ()
    dtype: Dtype = jnp.float32

    @property
    def nl(self) -> int:
        return len(self.anchors)

    @property
    def na(self) -> int:
        return len(self.anchors[0]) // 2

    @property
    def no(self) -> int:
        return self.nc + 5

    def _strides(self):
        return self.strides if self.strides else default_strides(self.nl)

    def anchors_px(self) -> np.ndarray:
        """(nl, na, 2) pixel anchors in stride-checked order."""
        a = np.asarray(self.anchors, dtype=np.float32).reshape(self.nl, self.na, 2)
        return check_anchor_order(a, self._strides())

    def anchors_grid_units(self) -> np.ndarray:
        """(nl, na, 2) anchors in grid units (pixel / stride), as used by the loss
        (reference yolo_test.py:105)."""
        s = np.asarray(self._strides(), dtype=np.float32).reshape(-1, 1, 1)
        return self.anchors_px() / s

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray], train: bool = False,
                 decode: bool = None):
        if decode is None:
            decode = not train
        anchors_px = self.anchors_px()
        strides = self._strides()
        raw, z, logits = [], [], []
        for i, x in enumerate(xs):
            b, ny, nx, _ = x.shape
            from icafusion_tpu.nn.layers import TORCH_CONV_INIT, torch_bias_init
            t = nn.Conv(self.no * self.na, kernel_size=(1, 1), use_bias=True,
                        kernel_init=TORCH_CONV_INIT,
                        bias_init=torch_bias_init(self.ch[i]),
                        dtype=self.dtype, name=f"m{i}")(x)
            t = t.reshape(b, ny, nx, self.na, self.no)
            raw.append(t)
            if decode:
                tf = t.astype(jnp.float32)
                y = jax.nn.sigmoid(tf)
                gx = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 1)
                gy = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 0)
                grid = jnp.stack([gx, gy], axis=-1)[:, :, None, :]      # (ny,nx,1,2)
                anc = jnp.asarray(anchors_px[i])[None, None, :, :]      # (1,1,na,2)
                xy = (y[..., 0:2] * 2.0 - 0.5 + grid) * float(strides[i])
                wh = (y[..., 2:4] * 2.0) ** 2 * anc
                out = jnp.concatenate([xy, wh, y[..., 4:]], axis=-1)
                z.append(out.reshape(b, ny * nx * self.na, self.no))
                logits.append(tf[..., 5:].reshape(b, ny * nx * self.na, self.nc))
        if not decode:
            return raw
        return jnp.concatenate(z, axis=1), jnp.concatenate(logits, axis=1), raw
