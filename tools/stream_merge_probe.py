"""Measure the stream-merge hypothesis on the chip.

The round-2 per-op profile (BENCH.md) showed the two 64-channel stages run at
11-24% MFU because XLA pads BOTH channel operands of a 64-ch conv to the
128-lane MXU width — an isolated 3x3 64->64 takes the SAME time as a 3x3
128->128. The flagship runs every backbone stage TWICE (RGB stream layers 0-9,
IR stream 10-19, reference yolov5l_Transfusion_*.yaml); so for the 64-ch
stages, two convs each waste half the MXU columns.

Hypothesis: concatenate the streams on the CHANNEL axis and run ONE conv with
a block-diagonal kernel (RGB weights in the top-left block, IR in the
bottom-right, zeros elsewhere — numerically identical outputs) — the padding
lanes XLA burns anyway now carry the other stream, and those stages should
run ~2x faster. A feature_group_count=2 grouped conv expresses the same
computation without the zero FLOPs; measure both lowerings.

Probes (flagship shapes, b32@640, bf16):
  stem    6x6/s2  3->64 @640^2   (2 instances)  vs  6->128 merged
  c3a     3x3/s1 64->64 @160^2   (6 instances)  vs 128->128 merged
  down1   3x3/s2 64->128 @320^2  (2 instances)  vs 128->256 merged
(the >=128-ch stages already run at 51-64% MFU — nothing to recover there).

Chained-scalar timing protocol per CLAUDE.md (block_until_ready lies over the
axon tunnel); first timed series discarded.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def conv(x, w, stride):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def gconv(x, w, stride, groups):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)


def timeit(fn, args, iters, warmup=3):
    """Chained-scalar timing; returns ms/iter of the second series."""
    carry = fn(*args)
    float(carry)  # compile + first

    for series in range(2):
        for _ in range(warmup):
            carry = fn(*(a + 0 * carry.astype(a.dtype) for a in args[:1]),
                       *args[1:])
        float(carry)
        t0 = time.time()
        c = jnp.float32(0)
        for _ in range(iters):
            carry = fn(*(a + 0 * c.astype(a.dtype) for a in args[:1]),
                       *args[1:])
            c = carry
        float(carry)
        dt = (time.time() - t0) / iters * 1e3
    return dt


def block_diag_kernel(w1, w2):
    """(kh,kw,ci,co) x2 -> (kh,kw,2ci,2co) with w1/w2 on the diagonal."""
    kh, kw, ci, co = w1.shape
    w = jnp.zeros((kh, kw, 2 * ci, 2 * co), w1.dtype)
    w = w.at[:, :, :ci, :co].set(w1)
    w = w.at[:, :, ci:, co:].set(w2)
    return w


def conv_i8(x8, w8, stride):
    return jax.lax.conv_general_dilated(
        x8, w8, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def probe_int8(name, b, h, ci, co, k, stride, iters):
    """Same comparison on the W8A8 path (utils/quantize.py's conv shape):
    int8 operands, int32 accumulation, f32 dequant epilogue."""
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.integers(-127, 128, (b, h, h, ci)), jnp.int8)
    x2 = jnp.asarray(rng.integers(-127, 128, x1.shape), jnp.int8)
    w1 = jnp.asarray(rng.integers(-127, 128, (k, k, ci, co)), jnp.int8)
    w2 = jnp.asarray(rng.integers(-127, 128, w1.shape), jnp.int8)
    xm = jnp.concatenate([x1, x2], axis=-1)
    wm = jnp.zeros((k, k, 2 * ci, 2 * co), jnp.int8)
    wm = wm.at[:, :, :ci, :co].set(w1).at[:, :, ci:, co:].set(w2)
    s = jnp.float32(0.01)

    @jax.jit
    def two(x, a, wa, wb):
        return ((conv_i8(x, wa, stride).astype(jnp.float32) * s).sum() +
                (conv_i8(a, wb, stride).astype(jnp.float32) * s).sum())

    @jax.jit
    def merged(x, w):
        return (conv_i8(x, w, stride).astype(jnp.float32) * s).sum()

    def chain2(x, a, wa, wb, c):
        # chain on the int8 inputs via a zero-valued int8 carry
        z = jnp.clip(c, 0, 0).astype(jnp.int8)
        return two(x + z, a, wa, wb)

    def chain1(x, w, c):
        z = jnp.clip(c, 0, 0).astype(jnp.int8)
        return merged(x + z, w)

    t_two = timeit_raw(lambda c: chain2(x1, x2, w1, w2, c), iters)
    t_mrg = timeit_raw(lambda c: chain1(xm, wm, c), iters)
    row = {"probe": f"{name}-int8", "shape": f"{k}x{k}/s{stride} {ci}->{co} @{h}",
           "two_convs_ms": round(t_two, 3), "blockdiag_ms": round(t_mrg, 3),
           "speedup_blockdiag": round(t_two / t_mrg, 2)}
    print(json.dumps(row), flush=True)
    return row


def timeit_raw(fn, iters, warmup=3):
    """Chained timing where fn(carry_scalar) -> scalar."""
    carry = fn(jnp.float32(0))
    float(carry)
    for series in range(2):
        for _ in range(warmup):
            carry = fn(carry)
        float(carry)
        t0 = time.time()
        carry = fn(jnp.float32(0))
        for _ in range(iters - 1):
            carry = fn(carry)
        float(carry)
        dt = (time.time() - t0) / iters * 1e3
    return dt


def probe(name, b, h, ci, co, k, stride, iters, dtype):
    key = jax.random.PRNGKey(0)
    x1 = jax.random.uniform(key, (b, h, h, ci), dtype)
    x2 = jax.random.uniform(jax.random.PRNGKey(1), x1.shape, dtype)
    w1 = jax.random.uniform(jax.random.PRNGKey(2), (k, k, ci, co), dtype) * 0.1
    w2 = jax.random.uniform(jax.random.PRNGKey(3), w1.shape, dtype) * 0.1

    xm = jnp.concatenate([x1, x2], axis=-1)
    wm = block_diag_kernel(w1, w2)
    # grouped layout: HWIO with I=ci per group, O stacked
    wg = jnp.concatenate([w1, w2], axis=-1)

    @jax.jit
    def two(x, a, wa, wb):
        return (conv(x, wa, stride).sum() +
                conv(a, wb, stride).sum()).astype(jnp.float32)

    @jax.jit
    def merged(x, w):
        return conv(x, w, stride).sum().astype(jnp.float32)

    @jax.jit
    def grouped(x, w):
        return gconv(x, w, stride, 2).sum().astype(jnp.float32)

    # numerical identity check (CPU-safe): merged == concat of the two
    y1, y2 = conv(x1, w1, stride), conv(x2, w2, stride)
    ym = conv(xm, wm, stride)
    yg = gconv(xm, wg, stride, 2)
    ref = jnp.concatenate([y1, y2], axis=-1)
    err_m = float(jnp.abs(ym - ref).max())
    err_g = float(jnp.abs(yg - ref).max())

    t_two = timeit(lambda x, a, wa, wb: two(x, a, wa, wb),
                   (x1, x2, w1, w2), iters)
    t_mrg = timeit(lambda x, w: merged(x, w), (xm, wm), iters)
    t_grp = timeit(lambda x, w: grouped(x, w), (xm, wg), iters)
    row = {"probe": name, "shape": f"{k}x{k}/s{stride} {ci}->{co} @{h}",
           "two_convs_ms": round(t_two, 3), "blockdiag_ms": round(t_mrg, 3),
           "grouped_ms": round(t_grp, 3),
           "speedup_blockdiag": round(t_two / t_mrg, 2),
           "speedup_grouped": round(t_two / t_grp, 2),
           "max_err_blockdiag": err_m, "max_err_grouped": err_g}
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    print(f"backend: {jax.default_backend()} devices: {jax.devices()}",
          file=sys.stderr)
    b = args.batch
    rows = [
        probe("stem", b, 640, 3, 64, 6, 2, args.iters, dt),
        probe("c3a", b, 160, 64, 64, 3, 1, args.iters, dt),
        probe("down1", b, 320, 64, 128, 3, 2, args.iters, dt),
        # control: a stage that is already lane-saturated — merge should NOT win
        probe("ctrl128", b, 80, 128, 128, 3, 1, args.iters, dt),
    ]
    for nm, h, ci, co, k, st in [("stem", 640, 3, 64, 6, 2),
                                 ("c3a", 160, 64, 64, 3, 1),
                                 ("down1", 320, 64, 128, 3, 2),
                                 ("ctrl128", 80, 128, 128, 3, 1)]:
        probe_int8(nm, b, h, ci, co, k, st, args.iters)
    saved = sum(r["two_convs_ms"] - min(r["blockdiag_ms"], r["grouped_ms"])
                for r in rows[:3])
    mult = {"stem": 1, "c3a": 3, "down1": 1}  # instances per stream pair
    saved_model = sum((r["two_convs_ms"] -
                       min(r["blockdiag_ms"], r["grouped_ms"])) * mult[r["probe"]]
                      for r in rows[:3])
    print(f"estimated end-to-end saving if merged: {saved_model:.1f} ms "
          f"of the ~61 ms b32 forward", file=sys.stderr)


if __name__ == "__main__":
    main()
