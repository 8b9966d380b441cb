"""End-to-end quickstart: build a two-stream detector from a reference YAML, run
paired RGB/IR inference with on-device decode+NMS, and evaluate one loss step.

Runs on whatever jax.devices() provides (TPU or CPU):
    python examples/quickstart.py [--cfg PATH] [--imgsz 320] [--batch 1]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from icafusion_tpu.config import load_hyp_config, load_model_config
from icafusion_tpu.models import build_model
from icafusion_tpu.ops.nms import detections_to_numpy, non_max_suppression
from icafusion_tpu.train.loss import YoloLoss, pad_targets


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="/root/reference/models/transformer/yolov5s_Transfusion_FLIR.yaml")
    ap.add_argument("--imgsz", type=int, default=320)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    print(f"devices: {jax.devices()}")
    cfg = load_model_config(args.cfg)
    print(f"config: {cfg.name}  nc={cfg.nc}  layers={len(cfg.layers)}  "
          f"two_stream={cfg.is_two_stream}")

    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    rgb = jax.random.uniform(rng, (args.batch, args.imgsz, args.imgsz, 3))
    ir = jax.random.uniform(jax.random.PRNGKey(1), rgb.shape)

    t0 = time.time()
    init_fn = jax.jit(model.init, static_argnames=("train", "decode"))
    variables = init_fn({"params": rng}, rgb, ir, train=False, decode=False)
    n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"]))
    print(f"init: {time.time()-t0:.1f}s  params={n_params/1e6:.2f}M")

    @jax.jit
    def infer(v, a, b):
        pred, logits, _ = model.apply(v, a, b, train=False, decode=True)
        return non_max_suppression(pred, conf_thres=0.25, iou_thres=0.45)

    t0 = time.time()
    dets = jax.block_until_ready(infer(variables, rgb, ir))
    print(f"first inference (compile+run): {time.time()-t0:.1f}s")
    t0 = time.time()
    n_rep = 10
    for _ in range(n_rep):
        dets = jax.block_until_ready(infer(variables, rgb, ir))
    dt = (time.time() - t0) / n_rep
    print(f"steady-state: {dt*1e3:.2f} ms/batch = {args.batch/dt:.1f} paired frames/s")
    out = detections_to_numpy(dets)
    print(f"detections per image: {[len(o) for o in out]}")
    if len(out[0]):
        print(f"first detection [x1,y1,x2,y2,conf,cls]: {out[0][0]}")

    # one loss evaluation on synthetic targets
    hyp = load_hyp_config()
    loss_fn = YoloLoss(hyp=hyp, nc=cfg.nc, anchors=model.anchors_grid_units())
    labels = [np.array([[0, 0.5, 0.5, 0.2, 0.3]], np.float32)] * args.batch
    targets, mask = pad_targets(labels, max_targets=32)

    @jax.jit
    def loss_step(v, a, b, t, m):
        preds = model.apply(v, a, b, train=False, decode=False)
        return loss_fn(preds, t, m)

    loss, items = jax.block_until_ready(
        loss_step(variables, rgb, ir, jnp.asarray(targets), jnp.asarray(mask)))
    print(f"loss={float(loss):.4f}  box/obj/cls/rk={np.asarray(items).round(4)}")


if __name__ == "__main__":
    main()
