"""Grad-CAM saliency for the two-stream detector.

Behavioral counterpart of reference models/gradcam.py:6-84 (YOLOV5GradCAM):
saliency = ReLU(sum_k alpha_k * A_k) with alpha_k = GAP of d(score)/d(A_k), where
A is a chosen layer's activation and the score is a detection's raw class logit
(the extra logits stream Detect emits for exactly this purpose —
yolo_test.py:57,:63).

The torch version uses forward/backward hooks; here the graph interpreter's
capture/override mechanism gives a clean functional cut: capture A on a forward
pass, then differentiate score(model with layer L's output *injected*) w.r.t. A.
No hooks, fully jittable.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def gradcam_saliency(model, variables, rgb, ir, layer: int,
                     class_idx: int = None, upsample_to: Tuple[int, int] = None):
    """Saliency map (B, H, W) in [0, 1] for the strongest detection's class score
    (or a fixed class_idx) w.r.t. `layer`'s activation."""

    _, caps = model.apply(variables, rgb, ir, train=False, decode=False,
                          capture=(layer,))
    act = caps[layer]

    def score_fn(a):
        pred, logits, _ = model.apply(variables, rgb, ir, train=False, decode=True,
                                      overrides={layer: a})
        conf = pred[..., 4]                       # (B, N)
        n_idx = jnp.argmax(conf, axis=1)          # strongest detection per image
        blog = jnp.take_along_axis(logits, n_idx[:, None, None], axis=1)[:, 0]
        if class_idx is None:
            cls = jnp.argmax(blog, axis=-1)
        else:
            cls = jnp.full((pred.shape[0],), class_idx)
        return jnp.take_along_axis(blog, cls[:, None], axis=1).sum()

    grads = jax.grad(score_fn)(act)
    alpha = jnp.mean(grads, axis=(1, 2), keepdims=True)       # GAP over H,W
    sal = jax.nn.relu(jnp.sum(alpha * act, axis=-1))          # (B, h, w)
    sal = sal / (jnp.max(sal, axis=(1, 2), keepdims=True) + 1e-8)
    if upsample_to is not None:
        b = sal.shape[0]
        sal = jax.image.resize(sal, (b, *upsample_to), method="linear")
    return sal


def default_cam_layers(cfg) -> Tuple[int, ...]:
    """The reference visualizes the three head C3 layers feeding Detect
    (gradcam_visual.py:10-12): use Detect's input layers."""
    from icafusion_tpu.models.assembler import detect_layer
    d = detect_layer(cfg)
    return tuple(d.f)
