"""Pallas TPU kernel: pixel-packed 3x3 conv for 64-channel stages.

Why: XLA lowers a 3x3 C64->C64 conv by padding BOTH channel operands to the
128-lane MXU width — measured on v5e, an isolated 3x3 64->64 takes the same
time as a 3x3 128->128 (4x the useful FLOPs), and in-model these convs run at
24% MFU vs 47% for their 128-channel neighbours (BENCH.md round-2 profile).
The flagship yolov5l-ICAFusion hits this six times per forward: the first C3
stage's bottleneck 3x3s (64->64 @160x160) in both streams (reference
models/common.py:184-235 C3/Bottleneck; the 64 = C3's c_ = c2//2 hidden width).

Idea: pack TWO horizontally adjacent pixels into one 128-lane group.
x (B,H,W,64) viewed as (B,H,W/2,128) — a free reshape. For the output pair
(2g, 2g+1) the 3x3 taps span pixels 2g-1..2g+2, i.e. exactly two *shifted*
packed columns:

    O_lo[g] = (x[2g-1], x[2g])      O_hi[g] = (x[2g+1], x[2g+2])

so each output row-group is six accumulated (M,128)@(128,128) matmuls (3 kernel
rows x {lo,hi}), with the 3x3 weights rearranged into 2x2 blocks of (64,64):

    W6[kh,lo] = [[W[kh,0],    0   ],     W6[kh,hi] = [[W[kh,2], W[kh,1]],
                 [W[kh,1], W[kh,0]]]                  [   0   , W[kh,2]]]

Density 576/768 = 75% of MACs useful vs XLA's 25% — full 128-lane output, full
128 contraction. BN affine (folded scale/bias) + SiLU run in the epilogue, so
the kernel could replace the whole Conv(c,c,3,1) module at eval time.

STATUS: EXPERIMENTAL — REJECTED BY MEASUREMENT (kept as evidence + test
oracle; not wired into the model). On v5e at the real shape (32,160,160,64)
bf16: this kernel 1.97 ms ≈ isolated XLA conv+SiLU 2.01 ms, but XLA *in-model*
runs the same conv at 1.28 ms (better layout choice + fused 1x1 epilogues).
The matmuls alone would take ~0.86 ms (80.5 executed GFLOP at the measured
94 TF/s dense rate); the other ~1.1 ms is the VPU cost of building the two
shifted O_lo/O_hi views (Mosaic supports neither lane-offset concatenation nor
bf16 rotates, forcing f32 converts + 3 circular rolls + masked selects per
row-tile). The pixel-packing idea only pays if the shifted views were free;
on this hardware the shuffle cost exceeds the reclaimed MXU lanes. Full
numbers in BENCH.md "Kernel-level findings".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_weights(w, bn_scale, bn_bias):
    """w: (3,3,Cin,Cout) HWIO with Cin=Cout=C<=64; bn_scale/bias: (C,) —
    the folded inference affine y = conv*scale + bias.
    Returns (w6 (3,2,128,128) bf16, bias2 (1,128) f32)."""
    kh, kw, ci, co = w.shape
    assert kh == kw == 3 and ci == co == 64, "pixel-packing assumes C == 64"
    w = np.asarray(w, np.float32) * np.asarray(bn_scale, np.float32)  # fold scale
    c = ci
    w6 = np.zeros((3, 2, 128, 128), np.float32)
    for r in range(3):
        # rows: packed input lanes (pixel p in {0,1} x channel); cols: packed
        # output lanes (out pixel q in {0,1} x channel)
        w6[r, 0, 0:c, 0:c] = w[r, 0]            # lo pixel 2g-1 -> out 2g (kw0)
        w6[r, 0, 64:64 + c, 0:c] = w[r, 1]      # lo pixel 2g   -> out 2g (kw1)
        w6[r, 0, 64:64 + c, 64:64 + c] = w[r, 0]  # pixel 2g  -> out 2g+1 (kw0)
        w6[r, 1, 0:c, 0:c] = w[r, 2]            # hi pixel 2g+1 -> out 2g (kw2)
        w6[r, 1, 0:c, 64:64 + c] = w[r, 1]      # pixel 2g+1 -> out 2g+1 (kw1)
        w6[r, 1, 64:64 + c, 64:64 + c] = w[r, 2]  # pixel 2g+2 -> out 2g+1 (kw2)
    bias2 = np.zeros((1, 128), np.float32)
    bias2[0, 0:c] = np.asarray(bn_bias, np.float32)
    bias2[0, 64:64 + c] = np.asarray(bn_bias, np.float32)
    return jnp.asarray(w6, jnp.bfloat16), jnp.asarray(bias2, jnp.float32)


def _kernel(x_ref, w6_ref, bias_ref, out_ref, epad_ref, *, H, G, TY, act):
    # zero-pad rows into scratch: epad[0] and epad[H+1] are the SAME-pad halo
    epad_ref[0:1] = jnp.zeros_like(epad_ref[0:1])
    epad_ref[H + 1:H + 2] = jnp.zeros_like(epad_ref[0:1])
    epad_ref[pl.ds(1, H)] = x_ref[0]

    w6 = w6_ref[:]                       # (3,2,128,128) bf16
    bias = bias_ref[:]                   # (1,128) f32
    def subtile(t, _):
        e = epad_ref[pl.ds(t * TY, TY + 2)]          # (TY+2, G, 128)
        # er[g] = (hi(g), lo(g)) — halves swapped within each 128-lane group.
        # Mosaic can't concatenate lane-offset slices and only rotates 32-bit
        # data (pltpu.bitcast packs different axes on hardware vs interpreter,
        # so it can't bridge that), so: convert to f32, build the shifted views
        # with circular rolls + masked selects, convert back:
        #   O_lo[g] = (pixel 2g-1, pixel 2g)  = (hi(g-1), lo(g))
        #   O_hi[g] = (pixel 2g+1, pixel 2g+2) = (hi(g),   lo(g+1))
        ef = e.astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, ef.shape, 2)
        grp = jax.lax.broadcasted_iota(jnp.int32, ef.shape, 1)
        er = pltpu.roll(ef, shift=64, axis=2)
        o_lo = jnp.where(lane < 64, pltpu.roll(er, shift=1, axis=1), er)
        o_lo = jnp.where((grp == 0) & (lane < 64), 0.0, o_lo)
        o_hi = jnp.where(lane < 64, er, pltpu.roll(er, shift=G - 1, axis=1))
        o_hi = jnp.where((grp == G - 1) & (lane >= 64), 0.0, o_hi)
        o_lo = o_lo.astype(e.dtype)
        o_hi = o_hi.astype(e.dtype)
        acc = jnp.zeros((TY * G, 128), jnp.float32)
        for r in range(3):
            acc += jax.lax.dot(o_lo[r:r + TY].reshape(TY * G, 128), w6[r, 0],
                               preferred_element_type=jnp.float32)
            acc += jax.lax.dot(o_hi[r:r + TY].reshape(TY * G, 128), w6[r, 1],
                               preferred_element_type=jnp.float32)
        y = acc + bias
        if act:
            y = y * jax.nn.sigmoid(y)                # SiLU epilogue
        out_ref[0, pl.ds(t * TY, TY)] = y.reshape(TY, G, 128).astype(
            out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, H // TY, subtile, 0)


@functools.partial(jax.jit, static_argnames=("act", "interpret"))
def packed_conv3x3_silu(x, w6, bias2, act: bool = True,
                        interpret: bool = False):
    """x: (B,H,W,64) with W even, H % 8 == 0. w6/bias2 from pack_weights.
    Returns SiLU(conv3x3_same(x, w)*scale + bias), same shape."""
    B, H, W, C = x.shape
    assert C == 64 and W % 2 == 0 and H % 8 == 0
    G = W // 2
    TY = 8 if H % 16 else 16
    xp = x.reshape(B, H, G, 128)
    out = pl.pallas_call(
        functools.partial(_kernel, H=H, G=G, TY=TY, act=act),
        out_shape=jax.ShapeDtypeStruct((B, H, G, 128), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, G, 128), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((3, 2, 128, 128), lambda b: (0, 0, 0, 0)),
            pl.BlockSpec((1, 128), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, G, 128), lambda b: (b, 0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((H + 2, G, 128), x.dtype)],
        interpret=interpret,
    )(xp, w6, bias2)
    return out.reshape(B, H, W, C)
