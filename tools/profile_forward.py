"""Per-op TPU profile of the flagship forward + train step (BENCH round 2).

The reference's only per-op instrumentation is forward_once(profile=True)
(yolo_test.py:144-152, x10 eager loops per module). Here the whole graph is one
XLA program, so the honest per-op view comes from the device trace: capture a
jax.profiler trace around chained executions, parse the perfetto JSON, and
aggregate busy time per fused-op name on the TPU track.

Outputs:
  - top-N ops by device busy time (name, ms/iter, % of busy)
  - busy-time buckets (conv / attention matmul / elementwise-fusion / copy / other)
  - FLOPs from XLA cost analysis, measured ms/iter, and MFU vs v5e bf16 peak
    for (a) forward-only, (b) forward+decode+NMS, (c) full train step.

Usage:
  PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_forward.py \
      --scale l --imgsz 640 --batch 32 [--train] [--trace-dir /tmp/icaf_trace]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

# TPU v5e (lite) peak: 394 TOPS int8 / 197 TFLOP/s bf16 per chip.
V5E_BF16_PEAK = 197e12


def chained_ms(fn, args0, iters=20, series=2):
    """ms/iter by chaining each iteration's input on the previous scalar output
    (block_until_ready is unreliable over the axon tunnel — CLAUDE.md)."""
    carry = fn(*args0)
    float(carry)
    a0 = args0[0]
    dt = float("nan")
    for _ in range(series):
        t0 = time.time()
        carry = jnp.float32(0)
        for _ in range(iters):
            carry = fn(a0 + 0 * carry, *args0[1:])
        float(carry)
        dt = (time.time() - t0) / iters
    return dt * 1e3


def cost_flops(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return float(c.get("flops", float("nan")))


def parse_perfetto(trace_dir, iters):
    """Aggregate device busy time from the perfetto trace. Events carry
    args.hlo_category ('convolution fusion', 'loop fusion', ...) and
    args.long_name (full HLO with shapes) — far more truthful than the
    display name, which calls conv fusions 'multiply_add_fusion' etc."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.json.gz"), recursive=True)
    if not paths:
        return None
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data
    per_cat = collections.Counter()
    per_op = collections.Counter()
    op_meta = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        a = e.get("args") or {}
        if "hlo_category" not in a:
            continue  # host-side / non-HLO event
        dur = e.get("dur", 0) / 1e3  # us -> ms
        per_cat[a["hlo_category"]] += dur
        total += dur
        name = e.get("name", "?")
        per_op[name] += dur
        if name not in op_meta:
            ln = a.get("long_name", "")
            m = re.match(r"%\S+ = (\S+?)\{", ln)
            op_meta[name] = (a["hlo_category"], m.group(1) if m else "?",
                             int(a.get("bytes_accessed", 0)))
    if total == 0:
        return None
    return per_cat, per_op, op_meta, total, path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="l")
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--trace-iters", type=int, default=5)
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--int8", action="store_true",
                    help="profile the W8A8-quantized serving path")
    ap.add_argument("--no-trace", action="store_true")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--trace-dir", default="/tmp/icaf_trace")
    ap.add_argument("--merge", default=None, metavar="K",
                    help="profile the stream-merged graph (int or 'auto')")
    args = ap.parse_args()

    from icafusion_tpu.models import build_model
    from icafusion_tpu.models.zoo import icafusion_config
    from icafusion_tpu.ops.nms import non_max_suppression

    cfg = icafusion_config(args.scale, nc=3, fusion="tfb")
    model = build_model(cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    B = args.batch
    shape = (B, args.imgsz, args.imgsz, 3)
    rgb = jax.random.uniform(rng, shape, jnp.float32)
    ir = jax.random.uniform(jax.random.PRNGKey(1), shape, jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train", "decode"))(
        {"params": rng}, rgb[:1], ir[:1], train=False, decode=False)

    if args.merge is not None:
        from icafusion_tpu.utils.stream_merge import (merge_stream_variables,
                                                      resolve_merge)
        mk = resolve_merge(args.merge, cfg)
        if mk:
            # device_put the merged (host numpy) tree or every profiled call
            # re-uploads the weights over the tunnel, swamping the profile
            variables = jax.device_put(
                merge_stream_variables(cfg, jax.device_get(variables),
                                       pairs=mk))
            model = build_model(cfg, dtype=jnp.bfloat16, merge_pairs=mk)
            print(f"profiling stream-merged graph (pairs={mk})")

    if args.train:
        from icafusion_tpu.config import load_hyp_config
        from icafusion_tpu.train.loss import pad_targets
        from icafusion_tpu.train.trainer import Trainer
        Bt = min(B, 16)
        tr = Trainer(model=model, hyp=load_hyp_config(), epochs=60,
                     steps_per_epoch=100, batch_size=Bt, imgsz=args.imgsz)
        state = tr.init_state(rng, rgb[:1], ir[:1])
        mask = None
        if getattr(model, "merge_pairs", 0):
            from icafusion_tpu.utils.stream_merge import grad_mask
            mask = jax.tree.map(jnp.asarray, grad_mask(
                cfg, jax.device_get(state.params), model.merge_pairs))
        raw_step = tr.make_train_step(grad_mask=mask)
        step = jax.jit(raw_step)
        t, m = pad_targets(
            [np.array([[0, .5, .5, .3, .3]], np.float32)] * Bt, 64)
        t, m = jnp.asarray(t), jnp.asarray(m)
        rgbt, irt = rgb[:Bt], ir[:Bt]

        def run(a, b):
            _, met = step(state, a, b, t, m)
            return met["loss"]

        ms = chained_ms(run, (rgbt, irt), iters=args.iters)
        # XLA cost analysis undercounts the train step (it reports less than the
        # forward alone — backward conv fusions are missed); use the standard
        # fwd+bwd ~= 3x fwd accounting from the forward's own cost analysis.
        fl_fwd = cost_flops(lambda v, a, b: model.apply(
            v, a, b, train=False, decode=False)[0].sum(), variables, rgbt, irt)
        fl = 3.0 * fl_fwd
        mfu = fl / (ms / 1e3) / V5E_BF16_PEAK
        print(f"TRAIN step b{Bt}@{args.imgsz}: {ms:.1f} ms/step, "
              f"~{fl/1e12:.2f} TFLOP (3x fwd cost-analysis; XLA's own train-step "
              f"count is unreliable), MFU ~{mfu*100:.1f}% of v5e bf16 peak")
        label = "train"
        traced = run
        targs = (rgbt, irt)
    else:
        if args.int8:
            from icafusion_tpu.utils.quantize import (calibrate,
                                                      quantize_variables)
            variables = quantize_variables(
                variables, calibrate(model, variables, [(rgb[:4], ir[:4])]))
            print("int8: quantized", file=sys.stderr)

        # pass variables as an argument: closing over 47M params embeds them as
        # constants in the remote-compile payload (HTTP 413 over the tunnel)
        def fwd(v, a, b):
            p3, p4, p5 = model.apply(v, a, b, train=False, decode=False)
            return p3.astype(jnp.float32).sum() + p4.astype(jnp.float32).sum() \
                + p5.astype(jnp.float32).sum()

        def serve(v, a, b):
            pred, _, _ = model.apply(v, a, b, train=False, decode=True)
            d = non_max_suppression(pred, conf_thres=0.001, iou_thres=0.5,
                                    max_det=300, top_k=8192, multi_label=True)
            return d.scores.sum() + d.boxes.sum()

        jfv, jsv = jax.jit(fwd), jax.jit(serve)
        jf = lambda a, b: jfv(variables, a, b)
        js = lambda a, b: jsv(variables, a, b)
        ms_f = chained_ms(jf, (rgb, ir), iters=args.iters)
        fl_f = cost_flops(fwd, variables, rgb, ir)
        mfu_f = fl_f / (ms_f / 1e3) / V5E_BF16_PEAK
        print(f"FWD-only b{B}@{args.imgsz}: {ms_f:.1f} ms, {fl_f/1e12:.2f} TFLOP"
              f", MFU {mfu_f*100:.1f}% of v5e bf16 peak "
              f"({B/(ms_f/1e3):.0f} paired fps)")
        ms_s = chained_ms(js, (rgb, ir), iters=args.iters)
        print(f"FWD+decode+NMS(eval settings): {ms_s:.1f} ms "
              f"({B/(ms_s/1e3):.0f} paired fps)")
        label = "fwd"
        traced = jf
        targs = (rgb, ir)

    if args.no_trace:
        return

    os.makedirs(args.trace_dir, exist_ok=True)
    jax.profiler.start_trace(args.trace_dir, create_perfetto_trace=True)
    carry = jnp.float32(0)
    for _ in range(args.trace_iters):
        carry = traced(targs[0] + 0 * carry, *targs[1:])
    float(carry)
    jax.profiler.stop_trace()

    parsed = parse_perfetto(args.trace_dir, args.trace_iters)
    if parsed is None:
        print("trace parse failed (no TPU XLA-Ops events found)", file=sys.stderr)
        return
    per_cat, per_op, op_meta, total, path = parsed
    it = args.trace_iters
    print(f"\ntrace: {path}\ndevice busy {total/it:.1f} ms/iter "
          f"({it} iters) [{label}]")
    print("\n-- busy-time by hlo_category --")
    for c, dur in per_cat.most_common():
        print(f"{c:28s} {dur/it:8.2f} ms/iter  {dur/total*100:5.1f}%")
    print(f"\n-- top {args.top} op instances --")
    for name, dur in per_op.most_common(args.top):
        cat, shape, nbytes = op_meta[name]
        gbs = nbytes / (dur / it / 1e3) / 1e9 if dur else 0.0
        print(f"{dur/it:8.3f} ms  {dur/total*100:5.1f}%  {cat:22s} "
              f"{shape:26s} {gbs:5.0f} GB/s  {name}")


if __name__ == "__main__":
    main()
