"""Backbone/neck op library — NHWC flax modules for the YAML graph DSL.

Behavioral counterparts of reference models/common.py and models/experimental.py,
re-designed for TPU:

- NHWC layout throughout (channel-last maps onto the 128-lane VPU/MXU tiling).
- Compute dtype is configurable (bf16 on TPU); params live in fp32.
- BatchNorm matches the reference's YOLOv5 settings (eps=1e-3, torch momentum 0.03
  -> flax momentum 0.97; reference utils/torch_utils.py initialize_weights).
- No in-place ops, no dynamic shapes: everything traces once under jit.

Each class cites the reference module it is behavior-compatible with.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# torch BatchNorm2d(momentum=0.03) == flax BatchNorm(momentum=0.97)
BN_MOMENTUM = 0.97
BN_EPS = 1e-3

# Train-step experiment knob (BENCH.md round-3): accumulate BN batch stats in
# the compute dtype (bf16) instead of forcing f32 reductions. The ~12 ms of
# memory-bound convert_reduce on the 64-ch stem maps reads bf16 and writes
# f32 partials; bf16 accumulation halves the partial traffic at a numerics
# cost (bf16 tree-sum of ~1.6M elements). Off by default; flip via
# ICAF_BN_BF16_REDUCE=1 for measurement.
import os as _os

BN_F32_REDUCTIONS = _os.environ.get("ICAF_BN_BF16_REDUCE", "0") != "1"

# torch Conv2d/Linear default init: kaiming_uniform(a=sqrt(5)) == uniform with
# var = 1/(3*fan_in). The reference never re-initializes conv weights
# (initialize_weights only touches BN/activations — torch_utils.py:46-56), so
# matching torch's default matters for from-scratch training parity.
TORCH_CONV_INIT = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")

# Opt-in space-to-depth stem rewrite (see Conv). Measured on TPU v5e: XLA's own
# handling of the 3-channel stem is already good — the rewrite was ~7% SLOWER
# end-to-end (72.6 vs 67.3 ms/b32 on the flagship), so it stays off by default
# (ICAF_STEM_S2D=1 enables it, e.g. for train-side measurement).
STEM_S2D_ENABLED = _os.environ.get("ICAF_STEM_S2D", "0") == "1"

# Opt-in phase-packed int8 stem (see Conv._phase_packed_stem). The int8 stem
# (6x6/s2, Cin=3 or 6 merged) is the profile's single largest op: 3.5 ms at
# ~26% utilization on b32@640 (round-4 int8+merge profile) because XLA pads
# the 108/216-deep contraction to the 128-lane MXU width. The rewrite packs
# 4x4 input phases into channels (contraction 16*Cin >= 96) and 2x2 output
# phases into output channels, trading 1.78x zero-fill FLOPs for full-depth
# MXU feeds. Exact integer arithmetic (same int32 accumulation). Off by
# default pending measurement (ICAF_STEM_PP=1 enables).
STEM_PP_ENABLED = _os.environ.get("ICAF_STEM_PP", "0") == "1"


def torch_bias_init(fan_in: int):
    """torch's U(-1/sqrt(fan_in), 1/sqrt(fan_in)) bias init."""
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(max(fan_in, 1))
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def autopad(k, p=None):
    """Pad to 'same' for odd kernels; matches reference models/common.py:36-40."""
    if p is None:
        p = k // 2 if isinstance(k, int) else tuple(x // 2 for x in k)
    return p


def _pair(x):
    return (x, x) if isinstance(x, int) else tuple(x)


def silu(x):
    return jax.nn.silu(x)


def _act_fn(act) -> Callable:
    """Resolve the 'act' ctor arg: True->SiLU, False/None->identity (common.py:54)."""
    if act is True:
        return silu
    if act in (False, None):
        return lambda x: x
    if callable(act):
        return act
    raise ValueError(f"unsupported activation spec: {act!r}")


class _Kernel(nn.Module):
    """Bare conv-kernel holder with nn.Conv-compatible naming (<name>/kernel)."""
    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", TORCH_CONV_INIT, self.shape, jnp.float32)


class Conv(nn.Module):
    """Conv2d(bias=False) + BatchNorm + SiLU (reference models/common.py:48-60).

    TPU stem optimization: the two towers' first layer (3->C, k6, s2, p2) runs at
    3/128 lane utilization on the MXU. It is re-expressed exactly as
    space-to-depth(2) + a 3x3/s1 conv over 12 channels with the SAME (6,6,3,C)
    parameter (rearranged at trace time) — ~4x better stem utilization, identical
    math and checkpoint layout."""
    c1: int
    c2: int
    k: Union[int, Tuple[int, int]] = 1
    s: Union[int, Tuple[int, int]] = 1
    p: Optional[Union[int, Tuple[int, int]]] = None
    g: int = 1
    act: Any = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = _pair(self.k)
        s = _pair(self.s)
        p = _pair(autopad(self.k, self.p))
        if (STEM_S2D_ENABLED
                and self.c1 == 3 and k == (6, 6) and s == (2, 2) and p == (2, 2)
                and self.g == 1 and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
            x = self._stem_s2d(x)
        elif not train and self.has_variable("quant", "w8"):
            x = self._int8_conv(x, s, p)
        else:
            if self.is_mutable_collection("calib"):
                # PTQ calibration pass (utils/quantize.py): record the input's
                # per-channel symmetric-range absmax for this conv
                self.sow("calib", "absmax",
                         jnp.abs(x).max(axis=(0, 1, 2)).astype(jnp.float32),
                         reduce_fn=jnp.maximum,
                         init_fn=lambda: jnp.zeros((x.shape[-1],),
                                                   jnp.float32))
            x = nn.Conv(self.c2, kernel_size=k, strides=s,
                        padding=[(p[0], p[0]), (p[1], p[1])],
                        feature_group_count=self.g, use_bias=False,
                        kernel_init=TORCH_CONV_INIT,
                        dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         force_float32_reductions=BN_F32_REDUCTIONS,
                         epsilon=BN_EPS, dtype=self.dtype, name="bn")(x)
        return _act_fn(self.act)(x)

    def _int8_conv(self, x, s, p):
        """W8A8 static-PTQ path (utils/quantize.py adds the 'quant' collection).
        Per-INPUT-channel activation scales are folded into the weights before
        their own per-OUTPUT-channel quantization (x ~= x8*s_in[ci],
        w*s_in ~= w8*s_w[co] => y ~= (x8 conv w8)*s_w), so dequantization is a
        single per-out-channel multiply. v5e runs int8 convs at ~1.5-1.8x the
        bf16 rate (BENCH.md); symmetric zero-point-0 quantization keeps SAME
        padding exact. BN + SiLU continue in self.dtype on the dequantized
        output."""
        w8 = self.get_variable("quant", "w8")
        s_w = self.get_variable("quant", "s_w")      # (c2,) f32 (incl. s_in)
        s_in = self.get_variable("quant", "s_in")    # (c1,) or () f32
        x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / s_in),
                      -127, 127).astype(jnp.int8)
        if (STEM_PP_ENABLED and _pair(self.k) == (6, 6) and s == (2, 2)
                and p == (2, 2) and self.g == 1
                and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0):
            return self._phase_packed_stem(x8, w8, s_w)
        y = jax.lax.conv_general_dilated(
            x8, w8, s, [(p[0], p[0]), (p[1], p[1])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.g, preferred_element_type=jnp.int32)
        return y.astype(self.dtype) * s_w.astype(self.dtype)

    def _phase_packed_stem(self, x8, w8, s_w):
        """Exact phase-packed rewrite of the int8 6x6/s2/p2 stem conv.

        Input rows/cols are grouped 4 at a time into channels (s2d by 4 — the
        [H,W,C] -> [H/4,W/4,16C] reshapes are free along the minormost dim),
        turning the conv into a 2x2/s1 conv with contraction depth 16*Cin
        (>= 96, near the 128-lane MXU width, vs the direct form's Cin=3/6
        which XLA pads 21x/10x). Each output block holds 2x2 output phases
        packed into channels; the packed kernel zero-fills the tap positions
        a phase never reads (56% density -> 1.78x extra FLOPs, repaid by the
        ~5x better lane utilization). Same int8 x int8 -> int32 accumulation,
        bit-exact vs the direct lowering (tests/test_layers_stem.py)."""
        B, H, W, C = x8.shape
        Co = w8.shape[-1]
        # the conv's own padding 2 makes the padded extent H+4, a multiple of
        # 4, and VALID over H/4+1 blocks yields exactly H/4 output blocks
        xp = jnp.pad(x8, ((0, 0), (2, 2), (2, 2), (0, 0)))
        nb, mb = (H + 4) // 4, (W + 4) // 4
        xpp = xp.reshape(B, nb, 4, mb, 4, C)
        xpp = xpp.transpose(0, 1, 3, 2, 4, 5).reshape(B, nb, mb, 16 * C)
        # packed kernel: output (oy,ox) = block (by,bx) + phase (ry,rx) reads
        # input row 4*(by+kyp) + qy where the original tap ky = 4*kyp+qy-2*ry
        wpp = jnp.zeros((2, 2, 16 * C, 4 * Co), w8.dtype)
        for ry in range(2):
            for qy in range(4):
                for kyp in range(2):
                    ky = 4 * kyp + qy - 2 * ry
                    if not 0 <= ky < 6:
                        continue
                    for rx in range(2):
                        for qx in range(4):
                            for kxp in range(2):
                                kx = 4 * kxp + qx - 2 * rx
                                if not 0 <= kx < 6:
                                    continue
                                ci = (qy * 4 + qx) * C
                                co = (ry * 2 + rx) * Co
                                wpp = wpp.at[kyp, kxp, ci:ci + C,
                                             co:co + Co].set(w8[ky, kx])
        y = jax.lax.conv_general_dilated(
            xpp, wpp, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        # dequantize on the packed layout (channel = (ry,rx,co), so s_w tiles),
        # then unpack the 2x2 output phases back to spatial
        y = y.astype(self.dtype) * jnp.tile(s_w, 4).astype(self.dtype)
        y = y.reshape(B, H // 4, W // 4, 2, 2, Co)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, Co)
        return y

    def _stem_s2d(self, x):
        w = _Kernel((6, 6, 3, self.c2), name="conv")().astype(self.dtype)
        # w[i,j,c,o] with i=2a+py, j=2b+px  ->  w2[a,b,(py*2+px)*3+c, o]
        w2 = w.reshape(3, 2, 3, 2, 3, self.c2)          # (a, py, b, px, c, o)
        w2 = w2.transpose(0, 2, 1, 3, 4, 5).reshape(3, 3, 12, self.c2)
        xp = jnp.pad(x.astype(self.dtype), ((0, 0), (2, 2), (2, 2), (0, 0)))
        b, hp, wp, _ = xp.shape
        x2 = xp.reshape(b, hp // 2, 2, wp // 2, 2, 3)
        x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp // 2, wp // 2, 12)
        dn = jax.lax.conv_dimension_numbers(x2.shape, w2.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(x2, w2, (1, 1), "VALID",
                                            dimension_numbers=dn)


def DWConv(c1, c2, k=1, s=1, act=True, dtype=jnp.float32):
    """Depthwise conv = grouped Conv with g=gcd(c1,c2) (common.py:43-45)."""
    return Conv(c1, c2, k, s, g=math.gcd(c1, c2), act=act, dtype=dtype)


class Bottleneck(nn.Module):
    """Standard bottleneck: 1x1 -> 3x3 with optional residual (common.py:184-194)."""
    c1: int
    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = Conv(self.c1, c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y = Conv(c_, self.c2, 3, 1, g=self.g, dtype=self.dtype, name="cv2")(y, train)
        return x + y if (self.shortcut and self.c1 == self.c2) else y


class BottleneckCSP(nn.Module):
    """CSP bottleneck, v4-style with LeakyReLU mix path (common.py:197-213)."""
    c1: int
    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(self.c1, c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            y1 = Bottleneck(c_, c_, self.shortcut, self.g, e=1.0,
                            dtype=self.dtype, name=f"m{i}")(y1, train)
        y1 = nn.Conv(c_, kernel_size=(1, 1), use_bias=False, kernel_init=TORCH_CONV_INIT, dtype=self.dtype, name="cv3")(y1)
        y2 = nn.Conv(c_, kernel_size=(1, 1), use_bias=False, kernel_init=TORCH_CONV_INIT, dtype=self.dtype, name="cv2")(x)
        y = jnp.concatenate([y1, y2], axis=-1)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         force_float32_reductions=BN_F32_REDUCTIONS,
                         epsilon=BN_EPS, dtype=self.dtype, name="bn")(y)
        y = nn.leaky_relu(y, negative_slope=0.1)
        return Conv(2 * c_, self.c2, 1, 1, dtype=self.dtype, name="cv4")(y, train)


class C3(nn.Module):
    """CSP bottleneck with 3 convs — the backbone workhorse (common.py:216-227)."""
    c1: int
    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    def _inner(self, y, train):
        for i in range(self.n):
            y = Bottleneck(self.c_, self.c_, self.shortcut, self.g, e=1.0,
                           dtype=self.dtype, name=f"m{i}")(y, train)
        return y

    @property
    def c_(self):
        return int(self.c2 * self.e)

    @nn.compact
    def __call__(self, x, train: bool = False):
        y1 = Conv(self.c1, self.c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y1 = self._inner(y1, train)
        y2 = Conv(self.c1, self.c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        y = jnp.concatenate([y1, y2], axis=-1)
        return Conv(2 * self.c_, self.c2, 1, dtype=self.dtype, name="cv3")(y, train)


class TransformerLayer(nn.Module):
    """ViT layer with LayerNorms removed (common.py:63-77); used inside C3TR."""
    c: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (seq, batch, c) in the reference; we use (batch, seq, c).
        q = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="q")(x)
        k = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="k")(x)
        v = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="v")(x)
        a = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.c, out_features=self.c,
            dtype=self.dtype, name="ma")(q, k, v)
        x = a + x
        y = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="fc1")(x)
        y = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="fc2")(y)
        return y + x


class TransformerBlock(nn.Module):
    """Flatten -> learned pos-emb -> N TransformerLayers -> unflatten (common.py:80-106)."""
    c1: int
    c2: int
    num_heads: int
    num_layers: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.c1 != self.c2:
            x = Conv(self.c1, self.c2, dtype=self.dtype, name="conv")(x, train)
        b, h, w, c = x.shape
        p = x.reshape(b, h * w, c)
        e = nn.Dense(self.c2, dtype=self.dtype, name="linear")(p)
        x = p + e
        for i in range(self.num_layers):
            x = TransformerLayer(self.c2, self.num_heads, dtype=self.dtype,
                                 name=f"tr{i}")(x, train)
        return x.reshape(b, h, w, self.c2)


class C3TR(nn.Module):
    """C3 whose inner stack is a TransformerBlock (common.py:230-235)."""
    c1: int
    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(self.c1, c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y1 = TransformerBlock(c_, c_, 4, self.n, dtype=self.dtype, name="m")(y1, train)
        y2 = Conv(self.c1, c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        y = jnp.concatenate([y1, y2], axis=-1)
        return Conv(2 * c_, self.c2, 1, dtype=self.dtype, name="cv3")(y, train)


def _max_pool_same_impl(x, k: int):
    p = k // 2
    return nn.max_pool(x, window_shape=(k, k), strides=(1, 1),
                       padding=[(p, p), (p, p)])


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _max_pool_same(x, k: int):
    """k x k max pool, stride 1, 'same' padding with -inf (torch MaxPool2d semantics).

    Custom VJP: XLA lowers the default max-pool gradient to select-and-scatter,
    a sequential per-window op that costs ~4 ms/step on the flagship train step
    (BENCH.md round-2 profile). The backward here routes each window's gradient
    to the FIRST (row-major) position attaining the window max — the same
    winner select-and-scatter and torch MaxPool2d pick, so the gradient is
    exactly theirs even under ties (which are systematic in chained SPPF
    pools: the middle pool's input already holds duplicated maxima). Per
    intra-window offset r: m_r[w] = (x[w+r-p] == y[w]) & not-yet-assigned[w],
    scattered back by a static-slice add — 3*k*k elementwise terms XLA fuses
    into loop fusions (tests/test_train_step.py asserts equality vs the
    default VJP on tied integer data and on chained pools).

    Restriction: custom_vjp removes forward-mode differentiability — jax.jvp/
    jacfwd through SPP/SPPF-containing models raises; use reverse mode (all
    in-repo training/Grad-CAM paths are reverse-mode).
    """
    return _max_pool_same_impl(x, k)


def _max_pool_same_fwd(x, k: int):
    y = _max_pool_same_impl(x, k)
    return y, (x, y)


def _max_pool_same_bwd(k: int, res, g):
    x, y = res
    p = k // 2
    H, W = x.shape[1], x.shape[2]
    neg = jnp.asarray(-jnp.inf, x.dtype)
    # x[w + r - p] for every output w and intra-window offset r in [0,k)^2 is
    # a static slice of x padded by p with -inf (never equal to a window max).
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), constant_values=neg)
    canvas = jnp.zeros(xp.shape, g.dtype)
    remaining = jnp.ones(y.shape, bool)
    zero = jnp.zeros_like(g)
    for ry in range(k):
        for rx in range(k):
            xs = jax.lax.slice_in_dim(
                jax.lax.slice_in_dim(xp, ry, ry + H, axis=1), rx, rx + W, axis=2)
            m = (xs == y) & remaining
            remaining = remaining & ~m
            contrib = jnp.where(m, g, zero)
            canvas = jax.lax.dynamic_update_slice(
                canvas,
                jax.lax.dynamic_slice(canvas, (0, ry, rx, 0),
                                      (canvas.shape[0], H, W, canvas.shape[3]))
                + contrib,
                (0, ry, rx, 0))
    return (jax.lax.slice(canvas, (0, p, p, 0),
                          (canvas.shape[0], p + H, p + W, canvas.shape[3])),)


_max_pool_same.defvjp(_max_pool_same_fwd, _max_pool_same_bwd)


class SPP(nn.Module):
    """Spatial pyramid pooling (common.py:238-249)."""
    c1: int
    c2: int
    k: Tuple[int, ...] = (5, 9, 13)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c1 // 2
        x = Conv(self.c1, c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [x] + [_max_pool_same(x, k) for k in self.k]
        y = jnp.concatenate(ys, axis=-1)
        return Conv(c_ * (len(self.k) + 1), self.c2, 1, 1, dtype=self.dtype, name="cv2")(y, train)


class SPPF(nn.Module):
    """SPP-Fast: three chained k-pools == SPP(k,(k,2k-1,3k-2)) (common.py:252-267)."""
    c1: int
    c2: int
    k: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c1 // 2
        x = Conv(self.c1, c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y1 = _max_pool_same(x, self.k)
        y2 = _max_pool_same(y1, self.k)
        y3 = _max_pool_same(y2, self.k)
        y = jnp.concatenate([x, y1, y2, y3], axis=-1)
        return Conv(c_ * 4, self.c2, 1, 1, dtype=self.dtype, name="cv2")(y, train)


class Focus(nn.Module):
    """Space-to-depth (2x2 pixel de-interleave) then Conv (common.py:270-281)."""
    c1: int
    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    act: Any = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # NHWC: gather even/odd rows and cols; channel order matches the
        # reference concat order [::2 ::2, 1::2 ::2, ::2 1::2, 1::2 1::2].
        y = jnp.concatenate([
            x[:, ::2, ::2, :], x[:, 1::2, ::2, :],
            x[:, ::2, 1::2, :], x[:, 1::2, 1::2, :]], axis=-1)
        return Conv(self.c1 * 4, self.c2, self.k, self.s, self.p, self.g,
                    self.act, dtype=self.dtype, name="conv")(y, train)


class Contract(nn.Module):
    """Width/height into channels, gain s (common.py:285-296)."""
    gain: int = 2

    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        s = self.gain
        x = x.reshape(b, h // s, s, w // s, s, c)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))     # b, h/s, w/s, s, s, c
        # reference (NCHW) ends with channel order (s*s, C) major->minor
        return x.reshape(b, h // s, w // s, s * s * c)


class Expand(nn.Module):
    """Channels into width/height, gain s (common.py:299-310)."""
    gain: int = 2

    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        s = self.gain
        x = x.reshape(b, h, w, s, s, c // (s * s))
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))     # b, h, s, w, s, c/s^2
        return x.reshape(b, h * s, w * s, c // (s * s))


class Concat(nn.Module):
    """Concatenate a list of tensors; YAML dim 1 == channel == NHWC axis -1
    (common.py:313-321)."""
    dimension: int = 1

    def __call__(self, xs, train: bool = False):
        axis = -1 if self.dimension == 1 else self.dimension
        return jnp.concatenate(list(xs), axis=axis)


class Upsample(nn.Module):
    """nn.Upsample analog; YAML args [None, scale, mode] (e.g. Transfusion head rows)."""
    size: Optional[Tuple[int, int]] = None
    scale_factor: Optional[float] = None
    mode: str = "nearest"

    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        if self.size is not None:
            nh, nw = self.size
        else:
            nh, nw = int(h * self.scale_factor), int(w * self.scale_factor)
        if self.mode == "nearest" and nh % h == 0 and nw % w == 0:
            # exact integer nearest upsample: repeat (cheap, layout-friendly)
            x = jnp.repeat(x, nh // h, axis=1)
            return jnp.repeat(x, nw // w, axis=2)
        method = {"nearest": "nearest", "bilinear": "linear"}[self.mode]
        return jax.image.resize(x, (b, nh, nw, c), method=method)


class BatchNorm2d(nn.Module):
    """Standalone BatchNorm layer for YAML rows using nn.BatchNorm2d."""
    c1: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         force_float32_reductions=BN_F32_REDUCTIONS,
                            epsilon=BN_EPS, dtype=self.dtype, name="bn")(x)


class MaxPool2d(nn.Module):
    """Standalone max pool for YAML rows (yolov3-tiny uses nn.MaxPool2d)."""
    k: int = 2
    s: int = 2
    p: int = 0

    def __call__(self, x, train: bool = False):
        return nn.max_pool(x, window_shape=(self.k, self.k), strides=(self.s, self.s),
                           padding=[(self.p, self.p), (self.p, self.p)])


# ---------------------------------------------------------------------------
# experimental.py counterparts
# ---------------------------------------------------------------------------

class CrossConv(nn.Module):
    """Cross conv downsample: (1,k) then (k,1) (experimental.py:11-22)."""
    c1: int
    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    e: float = 1.0
    shortcut: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = Conv(self.c1, c_, (1, self.k), (1, self.s), dtype=self.dtype, name="cv1")(x, train)
        y = Conv(c_, self.c2, (self.k, 1), (self.s, 1), g=self.g,
                 dtype=self.dtype, name="cv2")(y, train)
        return x + y if (self.shortcut and self.c1 == self.c2) else y


class Sum(nn.Module):
    """(Weighted) sum of n inputs (experimental.py:25-43)."""
    n: int
    weight: bool = False

    @nn.compact
    def __call__(self, xs, train: bool = False):
        y = xs[0]
        if self.weight:
            w = self.param("w", lambda k: -jnp.arange(1.0, self.n) / 2)
            w = jax.nn.sigmoid(w) * 2
            for i in range(self.n - 1):
                y = y + xs[i + 1] * w[i]
        else:
            for i in range(self.n - 1):
                y = y + xs[i + 1]
        return y


class GhostConv(nn.Module):
    """Ghost conv: half real features + cheap depthwise 5x5 (experimental.py:46-56)."""
    c1: int
    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: Any = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = Conv(self.c1, c_, self.k, self.s, None, self.g, self.act,
                 dtype=self.dtype, name="cv1")(x, train)
        y2 = Conv(c_, c_, 5, 1, None, c_, self.act, dtype=self.dtype, name="cv2")(y, train)
        return jnp.concatenate([y, y2], axis=-1)


class GhostBottleneck(nn.Module):
    """Ghost bottleneck (experimental.py:59-71)."""
    c1: int
    c2: int
    k: int = 3
    s: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = GhostConv(self.c1, c_, 1, 1, dtype=self.dtype, name="conv0")(x, train)
        if self.s == 2:
            y = DWConv(c_, c_, self.k, self.s, act=False, dtype=self.dtype)(y, train)
        y = GhostConv(c_, self.c2, 1, 1, act=False, dtype=self.dtype, name="conv2")(y, train)
        if self.s == 2:
            sc = DWConv(self.c1, self.c1, self.k, self.s, act=False, dtype=self.dtype)(x, train)
            sc = Conv(self.c1, self.c2, 1, 1, act=False, dtype=self.dtype, name="sc_pw")(sc, train)
        else:
            sc = x
        return y + sc


class MixConv2d(nn.Module):
    """Mixed-kernel conv with residual (experimental.py:74-95), equal_ch split."""
    c1: int
    c2: int
    k: Tuple[int, ...] = (1, 3)
    s: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        groups = len(self.k)
        # equal_ch split: floor(linspace) bucket counts (experimental.py:79-81)
        idx = jnp.floor(jnp.linspace(0, groups - 1e-6, self.c2))
        c_ = [int((idx == g).sum()) for g in range(groups)]
        ys = []
        for g, kk in enumerate(self.k):
            ys.append(nn.Conv(c_[g], kernel_size=(kk, kk), strides=(self.s, self.s),
                              padding=[(kk // 2, kk // 2)] * 2, use_bias=False,
                              dtype=self.dtype, name=f"m{g}")(x))
        y = jnp.concatenate(ys, axis=-1)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         force_float32_reductions=BN_F32_REDUCTIONS,
                         epsilon=BN_EPS, dtype=self.dtype, name="bn")(y)
        return x + nn.leaky_relu(y, negative_slope=0.1)


# ---------------------------------------------------------------------------
# channel/spatial attention (common.py:893-982 — shipped but unused by configs)
# ---------------------------------------------------------------------------

class SE_Block(nn.Module):
    """Squeeze-and-excitation (common.py:893-913)."""
    c1: int
    ratio: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        y = jnp.mean(x, axis=(1, 2))
        y = nn.Dense(c // self.ratio, use_bias=False, dtype=self.dtype, name="fc1")(y)
        y = jax.nn.relu(y)
        y = nn.Dense(c, use_bias=False, dtype=self.dtype, name="fc2")(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, None, :]


class ChannelAttention(nn.Module):
    """CBAM channel gate (common.py:916-939)."""
    c1: int
    ratio: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        avg = jnp.mean(x, axis=(1, 2))
        mx = jnp.max(x, axis=(1, 2))
        mlp = nn.Sequential([
            nn.Dense(self.c1 // self.ratio, use_bias=False, dtype=self.dtype),
            jax.nn.relu,
            nn.Dense(self.c1, use_bias=False, dtype=self.dtype)])
        y = jax.nn.sigmoid(mlp(avg) + mlp(mx))
        return x * y[:, None, None, :]


class SpatialAttention(nn.Module):
    """CBAM spatial gate (common.py:942-957)."""
    kernel_size: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        y = jnp.concatenate([avg, mx], axis=-1)
        p = self.kernel_size // 2
        y = nn.Conv(1, kernel_size=(self.kernel_size, self.kernel_size),
                    padding=[(p, p), (p, p)], use_bias=False,
                    dtype=self.dtype, name="conv")(y)
        return x * jax.nn.sigmoid(y)


class CBAM(nn.Module):
    """Channel then spatial attention (common.py:960-982)."""
    c1: int
    ratio: int = 16
    kernel_size: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ChannelAttention(self.c1, self.ratio, dtype=self.dtype, name="ca")(x, train)
        return SpatialAttention(self.kernel_size, dtype=self.dtype, name="sa")(x, train)


class Classify(nn.Module):
    """Classification head x(b,h,w,c1) -> x(b,c2) (common.py:556-566)."""
    c1: int
    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        xs = x if isinstance(x, (list, tuple)) else [x]
        z = jnp.concatenate([jnp.mean(y, axis=(1, 2), keepdims=True) for y in xs], axis=-1)
        z = nn.Conv(self.c2, kernel_size=(self.k, self.k), strides=(self.s, self.s),
                    padding=[(autopad(self.k),) * 2] * 2, feature_group_count=self.g,
                    dtype=self.dtype, name="conv")(z)
        return z.reshape(z.shape[0], -1)
