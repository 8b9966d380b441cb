"""A/B the file-serving pipeline (ServingEngine.predict_paths pipeline=True
vs False) through the full product path: JPEG pairs on disk -> native decode ->
H2D -> int8+merge forward + decode + NMS -> native-space detections.

The reference's latency story is wall-clock per image including IO
(detect_twostream.py:160-163 prints per-image inference Hz after cv2 reads);
this probe measures the same end-to-end wall through our engine, both modes,
and asserts the detections are identical.

Environment caveat (CLAUDE.md): in THIS container H2D rides a ~30-50 MB/s
tunnel, so upload dominates the file path. Measured at the product 512x640
geometry on this 1-CPU host (BENCH.md round 4): decode+letterbox is
~28 ms/pair — comparable to or above the device compute — and the pipeline
hides essentially all of it (1.16x end-to-end, 3.98 s of decode moved off
the critical path over 141 pairs). On a normally-attached multi-core host
the decode stage shrinks and the overlap win converges to decode/compute
ratio; the per-stage breakdown below lets that be computed honestly.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="artifacts/trained_s640/stripped.ckpt")
    ap.add_argument("--cfg", default="yolov5s_Transfusion_FLIR.yaml")
    ap.add_argument("--data", default="artifacts/trained_s640/extval")
    ap.add_argument("--imgsz", default="512x640", metavar="S|HxW")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--bf16", action="store_true",
                    help="skip int8 quantization (production default is int8)")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from icafusion_tpu.cli._common import resolve_model_config
    from icafusion_tpu.data import native
    from icafusion_tpu.models import build_model
    from icafusion_tpu.serve.engine import ServingEngine
    from icafusion_tpu.utils.checkpoint import load_inference_variables

    hw = tuple(int(x) for x in args.imgsz.split("x"))
    imgsz = hw[0] if len(hw) == 1 else hw

    mc = resolve_model_config(args.cfg, nc=3)
    model = build_model(mc)
    variables = load_inference_variables(str(ROOT / args.ckpt))

    vis = sorted((ROOT / args.data / "visible/val").glob("*.jpg"))
    rgb_paths = [str(p) for p in vis]
    ir_paths = [p.replace("visible", "infrared") for p in rgb_paths]
    print(f"{len(rgb_paths)} pairs from {args.data}", file=sys.stderr)

    eng = ServingEngine(model=model, variables=variables, img_size=imgsz,
                        batch_size=args.batch, merge_streams="auto")
    if not args.bf16:
        r, i, _, _, _ = native.decode_letterbox_batch(
            rgb_paths[:8], ir_paths[:8], eng.canvas, scaleup=True)
        eng.quantize([(r, i)])
    eng.warmup()

    # host decode cost alone (the stage the pipeline hides)
    t0 = time.time()
    native.decode_letterbox_batch(rgb_paths, ir_paths, eng.canvas,
                                  scaleup=True)
    t_dec = time.time() - t0
    print(f"decode-only: {t_dec*1e3:.0f} ms "
          f"({t_dec/len(rgb_paths)*1e3:.2f} ms/pair)", file=sys.stderr)

    results = {}
    for rep in range(args.reps):
        for mode in (False, True):
            t0 = time.time()
            outs = eng.predict_paths(rgb_paths, ir_paths, pipeline=mode)
            dt = time.time() - t0
            results.setdefault(mode, []).append(dt)
            print(f"rep{rep} pipeline={mode}: {dt*1e3:.0f} ms "
                  f"({len(rgb_paths)/dt:.1f} pairs/s)", file=sys.stderr)
            if mode is False:
                base = outs
            else:
                assert len(outs) == len(base) and all(
                    a.shape == b.shape and np.allclose(a, b)
                    for a, b in zip(outs, base)), \
                    "pipelined detections differ from serial"

    best_serial = min(results[False])
    best_pipe = min(results[True])
    n = len(rgb_paths)
    print(f"serial  best: {best_serial*1e3:.0f} ms ({n/best_serial:.1f} pairs/s)")
    print(f"pipeline best: {best_pipe*1e3:.0f} ms ({n/best_pipe:.1f} pairs/s)")
    print(f"speedup: {best_serial/best_pipe:.3f}x "
          f"(decode hidden: {t_dec*1e3:.0f} ms of the serial wall)")


if __name__ == "__main__":
    main()
