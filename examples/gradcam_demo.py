"""Grad-CAM saliency demo — counterpart of reference gradcam_visual.py:71-148
(which is broken as shipped; it imports a nonexistent module — SURVEY §2.7).

Overlays the strongest detection's class-score saliency for each head layer on the
RGB image:

    python examples/gradcam_demo.py --weights best.ckpt --cfg zoo:tiny \
        --rgb img_rgb.jpg --ir img_ir.jpg --img-size 128 --out /tmp/cam
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True)
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--rgb", required=True)
    ap.add_argument("--ir", required=True)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--out", default="runs/gradcam")
    args = ap.parse_args()

    from icafusion_tpu.cli._common import load_model_for_inference, setup_jax
    setup_jax()
    import cv2
    import jax.numpy as jnp

    from icafusion_tpu.data.augment import letterbox
    from icafusion_tpu.models.gradcam import default_cam_layers, gradcam_saliency

    mc, model, variables = load_model_for_inference(args.cfg, args.weights)
    img = cv2.cvtColor(cv2.imread(args.rgb), cv2.COLOR_BGR2RGB)
    ir = cv2.cvtColor(cv2.imread(args.ir), cv2.COLOR_BGR2RGB)
    S = args.img_size
    rgb_l, _, _ = letterbox(img, S, scaleup=True)
    ir_l, _, _ = letterbox(ir, S, scaleup=True)
    xr = jnp.asarray(rgb_l[None].astype(np.float32) / 255.0)
    xi = jnp.asarray(ir_l[None].astype(np.float32) / 255.0)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    for layer in default_cam_layers(mc):
        sal = np.asarray(gradcam_saliency(model, variables, xr, xi, layer=layer,
                                          upsample_to=(S, S)))[0]
        heat = cv2.applyColorMap((sal * 255).astype(np.uint8), cv2.COLORMAP_JET)
        overlay = cv2.addWeighted(rgb_l[:, :, ::-1], 0.5, heat, 0.5, 0)
        path = out / f"cam_layer{layer}.jpg"
        cv2.imwrite(str(path), overlay)
        print(f"layer {layer}: saliency peak {sal.max():.3f} -> {path}")


if __name__ == "__main__":
    main()
