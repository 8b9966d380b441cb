"""int8 PTQ accuracy on a TRAINED detector — the valid instrument.

The accuracy-parity harness (tools/accuracy_parity.py) measures int8 on a
BN-calibrated random-weight "shaped" detector; that instrument has no decision
margins, so the 2-3%/layer quantization noise scrambles its near-threshold
detections and the reported delta (~-94 pts) measures perturbation chaos, not
what PTQ costs a real model. This tool produces the meaningful number: train
the tiny two-stream model to convergence on the synthetic paired dataset
(examples/convergence_run.py recipe, mAP@50 ~0.9), then evaluate the SAME
checkpoint fp32 vs int8-quantized through the identical eval pipeline.

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/int8_accuracy.py \
        [--epochs 30] [--imgsz 128] [--workdir runs/int8_acc]
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "examples"))


def evaluate(model, variables, loader, nc, imgsz):
    from icafusion_tpu.eval.evaluator import Evaluator
    ev = Evaluator(model=model, nc=nc, conf_thres=0.001, iou_thres=0.5)
    out = ev.run(variables, loader.val_batches(), imgsz)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--imgsz", type=int, default=128)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--workdir", default="runs/int8_acc")
    ap.add_argument("--skip-train", action="store_true",
                    help="reuse the existing checkpoint in workdir")
    args = ap.parse_args()

    import jax.numpy as jnp

    from convergence_run import make_dataset
    from icafusion_tpu.config import DataConfig, load_hyp_config
    from icafusion_tpu.data.datasets import PairedDetectionDataset
    from icafusion_tpu.data.loader import PairedLoader
    from icafusion_tpu.models import build_model
    from icafusion_tpu.models.zoo import tiny_icafusion_config
    from icafusion_tpu.train.fit import FitConfig, fit
    from icafusion_tpu.utils.checkpoint import load_inference_variables
    from icafusion_tpu.utils.quantize import calibrate, quantize_variables

    work = Path(args.workdir)
    data_root = work / "data"
    if not (data_root / "visible/train").exists():
        make_dataset(data_root, args.n, np.random.default_rng(0))
    data_cfg = DataConfig(nc=3, names=("red", "green", "blue"),
                          path=str(data_root),
                          train_rgb="visible/train", val_rgb="visible/val",
                          train_ir="infrared/train", val_ir="infrared/val")
    mc = tiny_icafusion_config(nc=3)

    best = work / "runs" / "exp" / "weights" / "best.ckpt"
    if not (args.skip_train and best.exists()):
        hyp = load_hyp_config(None).replace(mosaic=0.5, warmup_epochs=2.0)
        result = fit(FitConfig(
            model_cfg=mc, data_cfg=data_cfg, hyp=hyp, epochs=args.epochs,
            batch_size=args.batch, imgsz=args.imgsz,
            project=str(work / "runs"), name="exp",
            eval_every=2, warmup_min_steps=50, max_targets=32, workers=4))
        best = Path(result["run_dir"]) / "weights" / "best.ckpt"
        print(f"trained: mAP50={result['map50']:.4f} ckpt={best}")

    model = build_model(mc, dtype=jnp.float32)
    variables = load_inference_variables(str(best))
    variables = jax.tree.map(jnp.asarray, variables)

    ds = PairedDetectionDataset(str(data_root / "visible/val"),
                                str(data_root / "infrared/val"),
                                img_size=args.imgsz, hyp=load_hyp_config(None),
                                augment=False, nc=3)
    loader = PairedLoader(ds, batch_size=8, shuffle=False)

    fp = evaluate(model, variables, loader, 3, args.imgsz)
    print(f"fp32 : mAP50={fp['map50']:.4f} mAP={fp['map']:.4f} "
          f"P={fp['mp']:.4f} R={fp['mr']:.4f}")

    calib_batches = []
    for b in loader.val_batches():
        calib_batches.append((jnp.asarray(b["rgb"], jnp.float32) / 255.0,
                              jnp.asarray(b["ir"], jnp.float32) / 255.0))
        if len(calib_batches) >= 2:
            break
    from icafusion_tpu.utils.quantize import detect_feeder_skip
    skip = detect_feeder_skip(mc)  # product default (ACCURACY.md round 3)
    qvars = quantize_variables(variables,
                               calibrate(model, variables, calib_batches),
                               skip=skip)
    q = evaluate(model, qvars, loader, 3, args.imgsz)
    print(f"int8 : mAP50={q['map50']:.4f} mAP={q['map']:.4f} "
          f"P={q['mp']:.4f} R={q['mr']:.4f}")
    delta50 = (q["map50"] - fp["map50"]) * 100
    delta = (q["map"] - fp["map"]) * 100
    print(f"delta: mAP50 {delta50:+.3f} pts, mAP@.5:.95 {delta:+.3f} pts")
    out = {"fp32": {k: float(fp[k]) for k in ("map50", "map", "mp", "mr")},
           "int8": {k: float(q[k]) for k in ("map50", "map", "mp", "mr")},
           "delta_map50_pts": float(delta50), "delta_map_pts": float(delta),
           "imgsz": args.imgsz, "epochs": args.epochs,
           "int8_skip": list(skip), "backend": jax.default_backend()}
    (work / "int8_accuracy.json").write_text(json.dumps(out, indent=2))
    print(f"wrote {work / 'int8_accuracy.json'}")


if __name__ == "__main__":
    main()
