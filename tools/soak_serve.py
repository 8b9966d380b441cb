"""Soak serving step: the stripped soak checkpoint through ServingEngine with
the production defaults (merge_streams='auto' + int8 W8A8 quantize), predicting
on the val pairs — proves the train->strip->serve handoff composes (reference
detect_twostream.py consumption of a stripped best.pt, experimental.py:113-134).
"""

import argparse
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--cfg", default="zoo:tfb:n")
    ap.add_argument("--imgsz", type=int, default=320)
    ap.add_argument("--batch", type=int, default=8)
    # soak checkpoints are trained for ~10 epochs on a toy set; the production
    # 0.25 default would (correctly) filter everything a weak model emits
    ap.add_argument("--conf", type=float, default=0.01)
    args = ap.parse_args()

    import cv2

    from icafusion_tpu.cli._common import resolve_model_config
    from icafusion_tpu.data.augment import letterbox
    from icafusion_tpu.models import build_model
    from icafusion_tpu.serve.engine import ServingEngine
    from icafusion_tpu.utils.checkpoint import load_inference_variables

    mc = resolve_model_config(args.cfg, nc=3)
    model = build_model(mc)
    variables = load_inference_variables(args.ckpt)

    vis = sorted((Path(args.data_root) / "visible/val").glob("*.jpg"))[:args.batch]
    rgb_b, ir_b, origs = [], [], []
    for p in vis:
        rgb = cv2.imread(str(p))[:, :, ::-1]
        ir = cv2.imread(str(p).replace("visible", "infrared"))[:, :, ::-1]
        origs.append(rgb.shape[:2])
        rgb_b.append(letterbox(rgb, (args.imgsz, args.imgsz))[0])
        ir_b.append(letterbox(ir, (args.imgsz, args.imgsz))[0])

    engine = ServingEngine(model=model, variables=variables,
                           img_size=args.imgsz, batch_size=args.batch,
                           conf_thres=args.conf, merge_streams="auto")
    print(f"engine: merge_streams={engine.merge_streams}, "
          f"devices={len(jax.devices())}")
    calib = [(np.stack(rgb_b), np.stack(ir_b))]
    engine.quantize(calib)
    print("quantized: int8 W8A8, Detect-feeder convs fp (product default)")
    dets = engine.predict_arrays(np.stack(rgb_b), np.stack(ir_b),
                                 orig_hw=origs)
    total = sum(len(d) for d in dets)
    assert len(dets) == len(vis) and total > 0, (len(dets), total)
    assert all(np.isfinite(d).all() for d in dets)
    print(f"served {len(dets)} pairs -> {total} detections "
          f"(int8+merge{engine.merge_streams} over the mesh) SERVE-OK")


if __name__ == "__main__":
    main()
