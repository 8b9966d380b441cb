"""Measure the dynamic micro-batcher's throughput under concurrent load.

Compares, on the real chip, pairs/sec through MicroBatcher.submit() from N
concurrent request threads against the same N requests served strictly
batch-1 (the reference Flask demo's execution model, restapi.py:16-37).
Inputs are pre-letterboxed arrays so the probe isolates the serving/batching
path (JPEG decode parallelizes in request threads and is host-bound on this
1-CPU dev box — not what we're measuring).

    python tools/batcher_load_probe.py --cfg zoo:tfb:l --imgsz 640 \
        --requests 128 --threads 32 [--int8] [--bf16-batch1]
"""

from __future__ import annotations

import argparse
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser("batcher-load-probe")
    ap.add_argument("--cfg", default="zoo:tfb:l")
    ap.add_argument("--imgsz", default="640", metavar="S|HxW")
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--requests", type=int, default=128)
    ap.add_argument("--threads", type=int, default=32)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--merge", default="auto")
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from icafusion_tpu.cli._common import resolve_model_config
    from icafusion_tpu.models.assembler import build_model
    from icafusion_tpu.serve.batcher import MicroBatcher
    from icafusion_tpu.serve.engine import ServingEngine

    hw = [int(v) for v in str(args.imgsz).split("x")]
    S = hw[0] if len(hw) == 1 else tuple(hw)
    (H, W) = (S, S) if isinstance(S, int) else S

    mc = resolve_model_config(args.cfg)
    model = build_model(mc)
    x = np.zeros((1, H, W, 3), np.float32)
    variables = jax.jit(model.init, static_argnames=("train", "decode"))(
        {"params": jax.random.PRNGKey(0)}, x, x, train=False, decode=False)
    engine = ServingEngine(model=model, variables=variables, img_size=S,
                           batch_size=args.batch_size,
                           merge_streams=args.merge)
    if args.int8:
        rng = np.random.default_rng(0)
        engine.quantize([(rng.integers(0, 255, (8, H, W, 3), np.uint8),
                          rng.integers(0, 255, (8, H, W, 3), np.uint8))])

    rng = np.random.default_rng(1)
    N = args.requests
    rgb = rng.integers(0, 255, (N, H, W, 3), np.uint8)
    ir = rng.integers(0, 255, (N, H, W, 3), np.uint8)

    # --- batch-1 serial baseline (the reference demo's execution model) ----
    print("compiling batch-1 ...", flush=True)
    engine._finalize(*engine._dispatch(rgb[:1], ir[:1], batch=1))
    t0 = time.time()
    for i in range(min(N, 32)):   # 32 is plenty to time the steady state
        engine._finalize(*engine._dispatch(rgb[i:i + 1], ir[i:i + 1],
                                           batch=1))
    n1 = min(N, 32)
    serial_fps = n1 / (time.time() - t0)
    print(f"batch-1 serial: {serial_fps:.1f} pairs/s "
          f"({1000 / serial_fps:.2f} ms/pair)", flush=True)

    # --- micro-batched concurrent load -------------------------------------
    with MicroBatcher(engine) as mb:
        print(f"compiling buckets {mb.buckets} ...", flush=True)
        mb.warmup()
        pool = ThreadPoolExecutor(args.threads)
        t0 = time.time()
        list(pool.map(lambda i: mb.submit(rgb[i % N], ir[i % N]), range(N)))
        dt = time.time() - t0
        pool.shutdown()
        stats = mb.stats()
    fps = N / dt
    print(f"micro-batched ({args.threads} threads): {fps:.1f} pairs/s "
          f"({1000 / fps:.2f} ms/pair) — {fps / serial_fps:.2f}x batch-1")
    print(f"stats: {stats}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
