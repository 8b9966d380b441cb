"""Model assembly: YAML layer lists -> a jittable two-stream flax module.

Behavioral counterpart of reference models/yolo_test.py:216-302 (parse_model) and
:115-163 (forward/forward_once):

- channel inference per module type replicates parse_model's rules, including
  depth_multiple/width_multiple scaling (yolo_test.py:231,:238-250);
- the ``eval()`` module DSL is replaced by an explicit registry (`MODULE_BUILDERS`);
- dual-input routing: a layer with ``from: -4`` consumes the second (IR) input
  (yolo_test.py:154-156); layers before the first fusion form two independent towers;
- save-list semantics: outputs referenced by later layers are kept (yolo_test.py:295).

The graph is interpreted in Python at trace time only — under jit the whole network
compiles to one XLA program; there is no per-layer dispatch at run time.

One deliberate divergence: the reference special-cases ``Conv`` with 64 raw output
channels to force c1=3 (yolo_test.py:240-244) — a hack to give the IR tower's first
conv 3 input channels. We instead key on ``from == -4`` / layer 0, which is the actual
intent and works for every shipped config.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from icafusion_tpu.config import FromSpec, ModelConfig
from icafusion_tpu.models.detect import Detect
from icafusion_tpu.nn import backbones, fusion, layers
from icafusion_tpu.utils.general import make_divisible

Dtype = Any

# Modules whose first two resolved args are (c1, c2) and whose c2 gets width-scaled
# (reference yolo_test.py:232-233).
_CONV_LIKE = {"Conv", "GhostConv", "Bottleneck", "GhostBottleneck", "SPP", "SPPF",
              "DWConv", "MixConv2d", "Focus", "CrossConv", "BottleneckCSP", "C3", "C3TR"}
# Modules that absorb the repeat count as an internal depth arg (yolo_test.py:251-253).
_ABSORB_N = {"BottleneckCSP", "C3", "C3TR"}


@dataclasses.dataclass(frozen=True)
class ResolvedLayer:
    i: int
    f: FromSpec            # -1 prev, -4 IR input, else absolute layer index (or tuple)
    n: int                 # repeats (1 if absorbed)
    module: str
    args: Tuple[Any, ...]  # fully resolved constructor args, reference-positional
    c2: int                # output channels


def _abs_from(f: FromSpec, i: int) -> FromSpec:
    def one(x: int) -> int:
        if x in (-1, -4):
            return x
        return x % i if x < 0 else x
    if isinstance(f, tuple):
        return tuple(one(x) for x in f)
    return one(f)


@functools.lru_cache(maxsize=64)
def resolve_model(cfg: ModelConfig) -> Tuple[Tuple[ResolvedLayer, ...], frozenset]:
    """Channel inference over the flattened layer list (parse_model port)."""
    gd, gw = cfg.depth_multiple, cfg.width_multiple
    no = cfg.no
    in_ch = cfg.ch
    ch: List[int] = [in_ch]   # after layer 0 this is reset to per-layer outputs
    resolved: List[ResolvedLayer] = []
    save: set = set()

    for ld in cfg.layers:
        i, f, n, m = ld.i, _abs_from(ld.f, ld.i), ld.n, ld.module
        args = list(ld.args)
        n = max(round(n * gd), 1) if n > 1 else n

        def src_ch(j: int) -> int:
            if j == -4:
                return in_ch
            return ch[j]

        if m in _CONV_LIKE:
            if m == "Focus" or f == -4 or i == 0:
                c1 = in_ch
            else:
                c1 = src_ch(f)
            c2 = args[0]
            if c2 != no:
                c2 = make_divisible(c2 * gw, 8)
            args = [c1, c2, *args[1:]]
            if m in _ABSORB_N:
                args.insert(2, n)
                n = 1
        elif m == "ResNetlayer":
            c2 = args[1] if args[3] else args[1] * 4
        elif m == "VGGblock":
            c2 = args[2]
        elif m == "BatchNorm2d":
            c2 = src_ch(f)
            args = [c2]
        elif m == "Concat":
            c2 = sum(src_ch(x) for x in f)
        elif m in ("Add", "DMAF"):
            c2 = src_ch(f[0])
            args = [c2]
        elif m == "Add2":
            c2 = src_ch(f[0])
            args = [c2, args[1]]
        elif m == "Detect":
            args.append(tuple(src_ch(x) for x in f))
            c2 = -1
        elif m == "Contract":
            c2 = src_ch(f) * args[0] ** 2
        elif m == "Expand":
            c2 = src_ch(f) // args[0] ** 2
        elif m == "NiNfusion":
            c1 = sum(src_ch(x) for x in f)
            c2 = c1 // 2
            args = [c1, c2, *args]
        elif m == "TransformerFusionBlock":
            c2 = src_ch(f[0])
            args = [c2, *args[1:]]
        else:
            c2 = src_ch(f) if isinstance(f, int) else src_ch(f[0])

        resolved.append(ResolvedLayer(i=i, f=f, n=n, module=m,
                                      args=tuple(args), c2=c2))
        for x in (f if isinstance(f, tuple) else (f,)):
            if x not in (-1, -4):
                save.add(x)
        if i == 0:
            ch = []
        ch.append(c2)

    return tuple(resolved), frozenset(save)


# ---------------------------------------------------------------------------
# registry: name -> builder(resolved args, dtype, flax name) -> module instance
# ---------------------------------------------------------------------------

def _conv(a, dt, name):
    return layers.Conv(*a, dtype=dt, name=name)

def _dwconv(a, dt, name):
    c1, c2 = a[0], a[1]
    k = a[2] if len(a) > 2 else 1
    s = a[3] if len(a) > 3 else 1
    act = a[4] if len(a) > 4 else True
    import math
    return layers.Conv(c1, c2, k, s, g=math.gcd(c1, c2), act=act, dtype=dt, name=name)

MODULE_BUILDERS = {
    "Conv": _conv,
    "DWConv": _dwconv,
    "Bottleneck": lambda a, dt, name: layers.Bottleneck(*a, dtype=dt, name=name),
    "BottleneckCSP": lambda a, dt, name: layers.BottleneckCSP(*a, dtype=dt, name=name),
    "C3": lambda a, dt, name: layers.C3(*a, dtype=dt, name=name),
    "C3TR": lambda a, dt, name: layers.C3TR(*a, dtype=dt, name=name),
    "SPP": lambda a, dt, name: layers.SPP(a[0], a[1], tuple(a[2]) if len(a) > 2 else (5, 9, 13),
                                          dtype=dt, name=name),
    "SPPF": lambda a, dt, name: layers.SPPF(*a, dtype=dt, name=name),
    "Focus": lambda a, dt, name: layers.Focus(*a, dtype=dt, name=name),
    "CrossConv": lambda a, dt, name: layers.CrossConv(*a, dtype=dt, name=name),
    "GhostConv": lambda a, dt, name: layers.GhostConv(*a, dtype=dt, name=name),
    "GhostBottleneck": lambda a, dt, name: layers.GhostBottleneck(*a, dtype=dt, name=name),
    "MixConv2d": lambda a, dt, name: layers.MixConv2d(a[0], a[1],
                                                      tuple(a[2]) if len(a) > 2 else (1, 3),
                                                      a[3] if len(a) > 3 else 1,
                                                      dtype=dt, name=name),
    "Contract": lambda a, dt, name: layers.Contract(gain=a[0], name=name),
    "Expand": lambda a, dt, name: layers.Expand(gain=a[0], name=name),
    "Concat": lambda a, dt, name: layers.Concat(dimension=a[0] if a else 1, name=name),
    "Upsample": lambda a, dt, name: layers.Upsample(
        size=a[0], scale_factor=a[1] if len(a) > 1 else None,
        mode=a[2] if len(a) > 2 else "nearest", name=name),
    "BatchNorm2d": lambda a, dt, name: layers.BatchNorm2d(a[0], dtype=dt, name=name),
    "MaxPool2d": lambda a, dt, name: layers.MaxPool2d(a[0], a[1] if len(a) > 1 else a[0],
                                                      name=name),
    "SE_Block": lambda a, dt, name: layers.SE_Block(*a, dtype=dt, name=name),
    "CBAM": lambda a, dt, name: layers.CBAM(*a, dtype=dt, name=name),
    # standalone CBAM gates (common.py:916-957: Channel_Attention(in_channels,
    # reduction_ratio), Spatial_Attention(kernel_size)); available to YAML like
    # SE_Block/CBAM even though no shipped config references them
    "Channel_Attention": lambda a, dt, name: layers.ChannelAttention(
        *a, dtype=dt, name=name),
    "Spatial_Attention": lambda a, dt, name: layers.SpatialAttention(
        *a, dtype=dt, name=name),
    "Classify": lambda a, dt, name: layers.Classify(*a, dtype=dt, name=name),
    # fusion family
    "Add": lambda a, dt, name: fusion.Add(c2=a[0] if a else 0, name=name),
    "Add2": lambda a, dt, name: fusion.Add2(c1=a[0], index=a[1], name=name),
    "NiNfusion": lambda a, dt, name: fusion.NiNfusion(a[0], a[1], dtype=dt, name=name),
    "DMAF": lambda a, dt, name: fusion.DMAF(c2=a[0] if a else 0, name=name),
    "TransformerFusionBlock": lambda a, dt, name: fusion.TransformerFusionBlock(
        d_model=a[0], vert_anchors=a[1], horz_anchors=a[2], dtype=dt, name=name),
    # alt backbones
    "VGGblock": lambda a, dt, name: backbones.VGGblock(*a, dtype=dt, name=name),
    "ResNetblock": lambda a, dt, name: backbones.ResNetblock(*a, dtype=dt, name=name),
    "ResNetlayer": lambda a, dt, name: backbones.ResNetlayer(*a, dtype=dt, name=name),
}


class _Repeat(nn.Module):
    """n independent copies applied sequentially (parse_model's nn.Sequential
    wrapping for n>1 — yolo_test.py:290)."""
    module: str
    args: Tuple[Any, ...]
    n: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for j in range(self.n):
            x = MODULE_BUILDERS[self.module](self.args, self.dtype, f"r{j}")(x, train=train)
        return x


class ICAFusionModel(nn.Module):
    """The two-stream detector: graph-interpreted YAML layers + Detect.

    __call__(x_rgb, x_ir, train, decode):
      train/decode=False -> list of nl raw maps (b, ny, nx, na, no)
      decode=True        -> (pred (b, N, no) decoded px boxes+scores,
                             cls_logits (b, N, nc), raw list)
    matching Model.forward_once semantics (yolo_test.py:115-163, Detect :43-65).

    merge_pairs=k runs the first k (RGB, IR) layer pairs as single modules on
    the channel-concatenated input with block-diagonal kernels — an MXU
    lane-recovery transform for the sub-128-channel stages (see
    utils/stream_merge.py); apply with merge_stream_variables(cfg, vars, k).
    """
    cfg: ModelConfig
    dtype: Dtype = jnp.float32
    merge_pairs: int = 0

    @nn.nowrap
    def detect_layer(self) -> ResolvedLayer:
        return detect_layer(self.cfg)

    @nn.nowrap
    def strides(self) -> Tuple[int, ...]:
        return model_strides(self.cfg)

    @nn.nowrap
    def anchors_grid_units(self) -> np.ndarray:
        return anchors_grid_units(self.cfg)

    @nn.compact
    def __call__(self, x, x2=None, train: bool = False, decode: Optional[bool] = None,
                 overrides: Optional[Dict[int, Any]] = None,
                 capture: Tuple[int, ...] = ()):
        """overrides: {layer_idx: activation} — replace a layer's output (Grad-CAM
        re-entry); capture: layer indices whose activations to also return. With
        capture non-empty the return value is (outputs, {idx: activation})."""
        resolved, save = resolve_model(self.cfg)
        y: Dict[int, Any] = {}
        captured: Dict[int, Any] = {}
        out = x.astype(self.dtype)
        x2 = out if x2 is None else x2.astype(self.dtype)

        skip: frozenset = frozenset()
        s = 0
        if self.merge_pairs:
            from icafusion_tpu.utils.stream_merge import (merged_args,
                                                          validate_merge)
            k = self.merge_pairs
            s = validate_merge(resolved, k)
            skip = frozenset(range(k)) | frozenset(range(s, s + k))
            if skip & (set(capture) | set(overrides or ())):
                raise ValueError("capture/overrides cannot target stream-"
                                 f"merged layers {sorted(skip)}")
            xm = jnp.concatenate([out, x2], axis=-1)
            for i in range(k):
                r = resolved[i]
                margs, mname = merged_args(r.module, r.args), f"m{r.i}_{s + r.i}"
                if r.n > 1:  # repeated non-absorbing module, same as main loop
                    mod = _Repeat(r.module, margs, r.n, dtype=self.dtype,
                                  name=mname)
                else:
                    mod = MODULE_BUILDERS[r.module](margs, self.dtype, mname)
                xm = mod(xm, train=train)
                if r.i in save:
                    y[r.i] = xm[..., :r.c2]
                if s + r.i in save:
                    y[s + r.i] = xm[..., r.c2:]
            out = xm[..., :resolved[k - 1].c2]
            x2 = xm[..., resolved[k - 1].c2:]  # layer s+k chains on this

        for r in resolved:
            if r.i in skip:
                continue
            if skip and r.i == s + self.merge_pairs and r.f == -1:
                out = x2  # resume the IR tower from the merged block's B half
            # resolve inputs (yolo_test.py:140-142, :154-156)
            if r.f == -4:
                inp = x2
            elif r.f == -1:
                inp = out
            elif isinstance(r.f, int):
                inp = y[r.f]
            else:
                inp = [out if j == -1 else y[j] for j in r.f]

            if r.module == "Detect":
                nc, anchors, ch = r.args
                det = Detect(nc=nc, anchors=anchors, ch=ch,
                             dtype=self.dtype, name=f"m{r.i}")
                out = det(inp, train=train, decode=decode)
            elif r.n > 1:
                out = _Repeat(r.module, r.args, r.n, dtype=self.dtype,
                              name=f"m{r.i}")(inp, train=train)
            else:
                out = MODULE_BUILDERS[r.module](r.args, self.dtype,
                                                f"m{r.i}")(inp, train=train)
            if overrides and r.i in overrides:
                out = overrides[r.i]
            if r.i in capture:
                captured[r.i] = out
            if r.i in save:
                y[r.i] = out
        if capture:
            return out, captured
        return out


def detect_layer(cfg: ModelConfig) -> ResolvedLayer:
    resolved, _ = resolve_model(cfg)
    assert resolved[-1].module == "Detect", "last layer must be Detect"
    return resolved[-1]


def model_strides(cfg: ModelConfig) -> Tuple[int, ...]:
    from icafusion_tpu.models.detect import default_strides
    nc, anchors, ch = detect_layer(cfg).args
    return default_strides(len(anchors))


def anchors_grid_units(cfg: ModelConfig) -> np.ndarray:
    """(nl, na, 2) anchors in grid units for the loss (yolo_test.py:105)."""
    from icafusion_tpu.models.detect import check_anchor_order, default_strides
    nc, anchors, ch = detect_layer(cfg).args
    nl = len(anchors)
    na = len(anchors[0]) // 2
    strides = default_strides(nl)
    a = np.asarray(anchors, dtype=np.float32).reshape(nl, na, 2)
    a = check_anchor_order(a, strides)
    return a / np.asarray(strides, np.float32).reshape(-1, 1, 1)


def build_model(cfg: ModelConfig, dtype=jnp.float32,
                merge_pairs: int = 0) -> ICAFusionModel:
    missing = {l.module for l in cfg.layers} - set(MODULE_BUILDERS) - {"Detect"}
    if missing:
        raise ValueError(f"config {cfg.name}: unknown modules {sorted(missing)}")
    return ICAFusionModel(cfg=cfg, dtype=dtype, merge_pairs=merge_pairs)
