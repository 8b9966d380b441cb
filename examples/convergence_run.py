"""Convergence artifact: full fit() loop (autoanchor -> EMA -> per-epoch eval ->
best-ckpt -> plots) on a generated synthetic paired dataset, on whatever
backend jax selects (TPU when available).

A working pipeline must push mAP@0.5 from ~0 to >0.5. The run dir (results.csv,
labels.png, train mosaics, PR/F1 curves, confusion matrix, results.png) is the
committed evidence; see BENCH.md.

    PYTHONPATH=/root/repo:$PYTHONPATH python examples/convergence_run.py \
        [--epochs 25] [--imgsz 128] [--batch 16] [--n 256] [--workdir DIR]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_dataset(root: Path, n: int, rng: np.random.Generator, nc: int = 3,
                 hw=(256, 256)):
    """Colored rectangles (RGB) with matching bright boxes (IR) on dark noise —
    separable by color (cls) and jointly localizable from either stream.
    hw: source canvas (FLIR-aligned frames are 512x640 — use that for a
    flagship-geometry instrument where rect val differs from square)."""
    import cv2
    for sub in ("visible/train", "infrared/train", "labels/train",
                "visible/val", "infrared/val", "labels/val"):
        (root / sub).mkdir(parents=True, exist_ok=True)
    split_at = int(n * 0.85)
    for i in range(n):
        split = "train" if i < split_at else "val"
        h, w = hw
        rgb = rng.integers(0, 40, (h, w, 3), dtype=np.uint8)
        ir = rng.integers(0, 30, (h, w, 3), dtype=np.uint8)
        lines = []
        for _ in range(int(rng.integers(1, 4))):
            bw, bh = int(rng.uniform(0.15, 0.4) * w), int(rng.uniform(0.15, 0.4) * h)
            x1, y1 = int(rng.uniform(0, w - bw)), int(rng.uniform(0, h - bh))
            cls = int(rng.integers(0, nc))
            color = [(255, 40, 40), (40, 255, 40), (40, 40, 255)][cls]
            cv2.rectangle(rgb, (x1, y1), (x1 + bw, y1 + bh), color, -1)
            cv2.rectangle(ir, (x1, y1), (x1 + bw, y1 + bh), (220, 220, 220), -1)
            lines.append(f"{cls} {(x1 + bw / 2) / w:.6f} {(y1 + bh / 2) / h:.6f} "
                         f"{bw / w:.6f} {bh / h:.6f}")
        cv2.imwrite(str(root / f"visible/{split}" / f"i{i:04d}.jpg"), rgb[:, :, ::-1])
        cv2.imwrite(str(root / f"infrared/{split}" / f"i{i:04d}.jpg"), ir[:, :, ::-1])
        (root / f"labels/{split}" / f"i{i:04d}.txt").write_text("\n".join(lines) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--imgsz", type=int, default=128)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--workdir", default="runs/convergence")
    ap.add_argument("--eval-every", type=int, default=2)
    ap.add_argument("--scale", default="tiny",
                    help="'tiny', a yolov5 scale letter (n/s/m/l), or an alt "
                         "backbone 'vgg16'/'resnet50'")
    ap.add_argument("--fusion", default="tfb", choices=["tfb", "nin", "add"],
                    help="fusion family for non-tiny scales (DMFF "
                         "transformer / NiN concat-conv / fixed-weight add)")
    ap.add_argument("--pretrained", default=None,
                    help="init weights: a reference-format .pt (converted, "
                         "stream-remapped if single-stream — train.py:94-99) "
                         "or one of our .ckpt files")
    ap.add_argument("--lr0", type=float, default=None,
                    help="override initial learning rate")
    ap.add_argument("--adam", action="store_true",
                    help="Adam optimizer (reference --adam)")
    ap.add_argument("--gate", type=float, default=0.5,
                    help="convergence gate on best mAP@0.5")
    ap.add_argument("--resume", default=None,
                    help="resume from a last.ckpt of a previous run over the "
                         "same workdir dataset")
    ap.add_argument("--canvas", default="256x256", metavar="HxW",
                    help="source image canvas, e.g. 512x640 for FLIR-shaped "
                         "frames (only applies when the dataset is generated)")
    ap.add_argument("--merge-streams", default="0", metavar="K",
                    help="stream-merged training ('auto' or int)")
    args = ap.parse_args()

    from icafusion_tpu.config import DataConfig, load_hyp_config
    from icafusion_tpu.models.zoo import (icafusion_config,
                                          resnet50_icafusion_config,
                                          tiny_icafusion_config,
                                          vgg16_icafusion_config)
    from icafusion_tpu.train.fit import FitConfig, fit
    from icafusion_tpu.utils.stream_merge import resolve_merge

    work = Path(args.workdir)
    data_root = work / "data"
    if not (data_root / "visible/train").exists():
        hw = tuple(int(x) for x in args.canvas.split("x"))
        make_dataset(data_root, args.n, np.random.default_rng(0), hw=hw)
        print(f"dataset: {args.n} pairs ({hw[0]}x{hw[1]}) under {data_root}")

    print(f"devices: {jax.devices()}")
    data_cfg = DataConfig(nc=3, names=("red", "green", "blue"),
                          path=str(data_root),
                          train_rgb="visible/train", val_rgb="visible/val",
                          train_ir="infrared/train", val_ir="infrared/val")
    hyp = load_hyp_config(None).replace(mosaic=0.5, warmup_epochs=2.0)
    if args.lr0 is not None:
        hyp = hyp.replace(lr0=args.lr0)
    if args.scale == "tiny":
        mc = tiny_icafusion_config(nc=3)
    elif args.scale == "vgg16":
        mc = vgg16_icafusion_config(nc=3, fusion=args.fusion)
    elif args.scale == "resnet50":
        mc = resnet50_icafusion_config(nc=3, fusion=args.fusion)
    else:
        mc = icafusion_config(args.scale, nc=3, fusion=args.fusion)
    result = fit(FitConfig(
        model_cfg=mc, data_cfg=data_cfg, hyp=hyp,
        epochs=args.epochs, batch_size=args.batch, imgsz=args.imgsz,
        project=str(work / "runs"), name="exp", eval_every=args.eval_every,
        warmup_min_steps=50, max_targets=32, workers=4,
        pretrained=args.pretrained, adam=args.adam, resume=args.resume,
        merge_streams=resolve_merge(args.merge_streams, mc)))
    print(f"final: mAP50={result['map50']:.4f} best={result['best_fitness']:.4f} "
          f"run={result['run_dir']}")
    assert result["best_fitness"] > args.gate, \
        f"convergence gate: mAP@0.5 must exceed {args.gate}"
    print("CONVERGENCE OK")


if __name__ == "__main__":
    main()
