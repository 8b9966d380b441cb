"""End-to-end smoke train: synthetic paired dataset -> tiny ICAFusion -> mAP.

Generates a disk dataset of colored rectangles (RGB) with matching bright boxes
(IR), trains the tiny two-stream model, and evaluates mAP@0.5 before and after.
A working pipeline must push mAP from ~0 to >0.5 within a few hundred steps.

    python examples/train_synthetic.py [--steps 300] [--imgsz 128] [--batch 16]
"""

import argparse
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp

from icafusion_tpu.config import load_hyp_config
from icafusion_tpu.data.datasets import PairedDetectionDataset
from icafusion_tpu.data.loader import PairedLoader
from icafusion_tpu.eval.evaluator import Evaluator
from icafusion_tpu.models import build_model
from icafusion_tpu.models.zoo import tiny_icafusion_config
from icafusion_tpu.train.trainer import Trainer


def make_dataset(root: Path, n: int, rng: np.random.Generator, nc: int = 3):
    import cv2
    for sub in ("visible/train", "infrared/train", "labels/train"):
        (root / sub).mkdir(parents=True, exist_ok=True)
    for i in range(n):
        h, w = 256, 256
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
            lines.append(f"{cls} {(x1+bw/2)/w:.6f} {(y1+bh/2)/h:.6f} {bw/w:.6f} {bh/h:.6f}")
        cv2.imwrite(str(root / "visible/train" / f"i{i:04d}.jpg"), rgb[:, :, ::-1])
        cv2.imwrite(str(root / "infrared/train" / f"i{i:04d}.jpg"), ir[:, :, ::-1])
        (root / "labels/train" / f"i{i:04d}.txt").write_text("\n".join(lines) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--imgsz", type=int, default=128)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--n-images", type=int, default=128)
    args = ap.parse_args()

    root = Path(tempfile.mkdtemp(prefix="icafusion_synth_"))
    make_dataset(root, args.n_images, np.random.default_rng(0))
    print(f"dataset at {root}")

    hyp = load_hyp_config(mosaic=0.5, scale=0.3, translate=0.1, fliplr=0.5,
                          warmup_epochs=0.5)
    ds = PairedDetectionDataset(str(root / "visible/train"),
                                str(root / "infrared/train"),
                                img_size=args.imgsz, hyp=hyp, augment=True, nc=3)
    ds_val = PairedDetectionDataset(str(root / "visible/train"),
                                    str(root / "infrared/train"),
                                    img_size=args.imgsz, hyp=hyp, augment=False, nc=3)
    loader = PairedLoader(ds, batch_size=args.batch, max_targets=32, seed=0)
    val_loader = PairedLoader(ds_val, batch_size=args.batch, max_targets=32,
                              shuffle=False)

    cfg = tiny_icafusion_config(nc=3)
    model = build_model(cfg)
    epochs = max(args.steps // loader.steps_per_epoch, 1)
    trainer = Trainer(model=model, hyp=hyp, epochs=epochs,
                      steps_per_epoch=loader.steps_per_epoch,
                      batch_size=args.batch, imgsz=args.imgsz,
                      warmup_min_steps=100)
    b0 = next(iter(loader.epoch(0)))
    state = trainer.init_state(jax.random.PRNGKey(0), b0["rgb"][:1].astype(np.float32),
                               b0["ir"][:1].astype(np.float32))
    raw_step = trainer.make_train_step()

    @jax.jit
    def step(state, rgb, ir, t, m):
        return raw_step(state, rgb.astype(jnp.float32) / 255.0,
                        ir.astype(jnp.float32) / 255.0, t, m)

    evaluator = Evaluator(model=model, nc=3, top_k=2048)

    def eval_map(st):
        variables = {"params": st.params, "batch_stats": st.batch_stats}
        out = evaluator.run(variables, val_loader.val_batches(), args.imgsz)
        return out

    t0 = time.time()
    before = eval_map(state)
    print(f"mAP@50 before: {before['map50']:.4f} ({time.time()-t0:.0f}s)")

    step_i, epoch = 0, 0
    t0 = time.time()
    while step_i < args.steps:
        for batch in loader.epoch(epoch):
            state, metrics = step(state, jnp.asarray(batch["rgb"]),
                                  jnp.asarray(batch["ir"]),
                                  jnp.asarray(batch["targets"]),
                                  jnp.asarray(batch["mask"]))
            step_i += 1
            if step_i % 50 == 0:
                print(f"step {step_i}: loss={float(metrics['loss']):.4f} "
                      f"box={float(metrics['lbox']):.4f} obj={float(metrics['lobj']):.4f} "
                      f"cls={float(metrics['lcls']):.4f} lr={float(metrics['lr']):.5f}")
            if step_i >= args.steps:
                break
        epoch += 1
    print(f"train: {time.time()-t0:.0f}s for {step_i} steps")

    after = eval_map(state)
    print(f"mAP@50 after: {after['map50']:.4f}  mAP: {after['map']:.4f}")
    ema_vars = state.ema.tree
    out_ema = evaluator.run(ema_vars, val_loader.val_batches(), args.imgsz)
    print(f"mAP@50 after (EMA): {out_ema['map50']:.4f}")
    ok = after["map50"] > 0.5 or out_ema["map50"] > 0.5
    print("RESULT:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
