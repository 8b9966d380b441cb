"""Compatibility shims for running the reference torch implementation in-process.

The container lacks torchvision/timm; the reference only needs them on a few
code paths (torchvision.ops.nms inside general.py:591, timm's DropPath import).
This module installs stubs PLUS a real greedy NMS with exact torchvision
semantics so the reference's non_max_suppression (general.py:518-607) runs
unmodified, and provides helpers to build a reference two-stream model whose
eval-mode activations are alive (BN calibration) and whose Detect head emits a
realistic confidence spectrum (bias shaping) — the substrate for the
accuracy-parity harness (tools/accuracy_parity.py).

No reference code is copied here; everything is called through imports.
"""

from __future__ import annotations

import sys
import types

import numpy as np

REF = "/root/reference"

# greedy NMS iterates until this many boxes are kept; the reference truncates
# keep[:max_det=300] afterwards (general.py:592-593), so any cap > 300 yields
# identical output while bounding the python loop
NMS_KEEP_CAP = 512


def _torchvision_nms(boxes, scores, iou_threshold):
    """Exact torchvision.ops.nms semantics: sort by score descending, greedily
    keep, suppress IoU > threshold (strictly greater). Pure torch."""
    import torch
    keep = []
    order = torch.argsort(scores, descending=True)
    while order.numel() > 0 and len(keep) < NMS_KEEP_CAP:
        i = order[0]
        keep.append(int(i))
        if order.numel() == 1:
            break
        rest = order[1:]
        lt = torch.maximum(boxes[i, :2], boxes[rest, :2])
        rb = torch.minimum(boxes[i, 2:4], boxes[rest, 2:4])
        inter = (rb - lt).clamp(min=0).prod(1)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        area_r = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / (area_i + area_r - inter)
        order = rest[iou <= iou_threshold]
    return torch.as_tensor(keep, dtype=torch.long)


def stub_torch_deps():
    """Install pkg_resources/timm/torchvision stubs (torchvision.ops.nms is the
    real greedy implementation above). Idempotent."""
    import torch

    if "pkg_resources" not in sys.modules:
        try:
            import pkg_resources  # noqa: F401
        except ImportError:
            pr = types.ModuleType("pkg_resources")
            pr.parse_version = lambda v: tuple(
                int(x) for x in str(v).split(".")[:3] if x.isdigit())
            sys.modules["pkg_resources"] = pr
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        tm = types.ModuleType("timm.models")
        tl = types.ModuleType("timm.models.layers")
        tl.DropPath = torch.nn.Identity
        timm.models = tm
        tm.layers = tl
        sys.modules.update({"timm": timm, "timm.models": tm,
                            "timm.models.layers": tl})
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        utils_mod = types.ModuleType("torchvision.utils")
        utils_mod.save_image = lambda *a, **k: None
        tv.utils = utils_mod
        ops = types.ModuleType("torchvision.ops")
        ops.nms = _torchvision_nms
        tv.ops = ops
        sys.modules.update({"torchvision": tv,
                            "torchvision.transforms": tv.transforms,
                            "torchvision.utils": utils_mod,
                            "torchvision.ops": ops})
    else:
        # ensure the real greedy nms is installed even if an earlier stub
        # (e.g. tests/test_torch_parity.py's raising stub) got there first
        sys.modules["torchvision"].ops.nms = _torchvision_nms
        sys.modules["torchvision.ops"].nms = _torchvision_nms
    if REF not in sys.path:
        sys.path.insert(0, REF)


def build_reference_model(cfg_path: str, seed: int = 0,
                          calibration_pairs=None,
                          detect_shaping: bool = False):
    """Build the reference two-stream Model (models/yolo_test.py:75) in eval mode.

    calibration_pairs: optional (rgb, ir) float batch NCHW in [0,1]; one
    train-mode forward with BN momentum=1 sets running stats to the batch stats
    so eval-mode activations are O(1) through the full depth (at default init
    the eval-path features underflow to exactly 0 by the detect head).

    detect_shaping: scale detect conv weights x3 and shift obj/cls biases so
    conf = obj*cls spans the eval threshold (0.001) like a trained model:
    ~10k candidates > 1e-3, hundreds > 1e-2, tens > 0.1 per 320px image.
    """
    import torch
    stub_torch_deps()
    from models.yolo_test import Model  # reference

    torch.manual_seed(seed)
    model = Model(cfg_path)

    if calibration_pairs is not None:
        rgb, ir = calibration_pairs
        for mod in model.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.momentum = 1.0
        model.train()
        with torch.no_grad():
            model(torch.as_tensor(rgb), torch.as_tensor(ir))
    model.eval()

    if detect_shaping:
        det = model.model[-1]
        g = torch.Generator().manual_seed(seed + 7)
        # per-level wh bias: decoded wh = (2*sigmoid)^2 * anchor must stay
        # inside the canvas (P5 anchors reach 373px) but above a few pixels
        # (P3 anchors start at 10px). Boxes decoding past the image get
        # clipped into near-identical rectangles — degenerate GT that turns
        # the matcher into a tie-breaking lottery; boxes under ~2px are
        # dropped from GT and orphan their detections as false positives.
        wh_bias = [0.0, -0.6, -1.45]   # sigmoid ~ .50/.35/.19 at P3/P4/P5
        for li, conv in enumerate(det.m):
            with torch.no_grad():
                conv.weight.mul_(3.0)
                b = conv.bias.view(det.na, det.no)
                w = conv.weight.view(det.na, det.no, *conv.weight.shape[1:])
                w[:, 2:4].mul_(0.1)
                b[:, 2:4] = wh_bias[min(li, len(wh_bias) - 1)]
                b[:, 4] = b[:, 4] * 3.0 - 4.5
                b[:, 5:] = (b[:, 5:] * 3.0 - 2.0
                            + 0.5 * torch.randn(det.na, det.no - 5, generator=g))
    return model


def calibrate_detect_density(model, probe_batches, target_per_img: float = 40.0,
                             conf: float = 0.10):
    """Shift the Detect obj biases by a single scalar so the model emits
    ~target_per_img anchor candidates with conf=obj*cls above ``conf`` per
    image — the density of a plausibly-trained detector, keeping NMS keeps
    well under max_det so the eval comparison isn't saturated-tail noise.

    probe_batches: list of (rgb, ir) NCHW float batches in [0,1]."""
    import torch

    objs, clss, n_img = [], [], 0
    with torch.no_grad():
        for rgb, ir in probe_batches:
            z, _, _ = model(torch.as_tensor(rgb), torch.as_tensor(ir))
            objs.append(z[..., 4].reshape(-1))
            clss.append(z[..., 5:].reshape(-1, z.shape[-1] - 5))
            n_img += z.shape[0]
    obj = torch.cat(objs).clamp(1e-6, 1 - 1e-6)
    cls = torch.cat(clss)
    obj_logit = torch.log(obj) - torch.log1p(-obj)

    def count(delta):
        c = torch.sigmoid(obj_logit + delta)[:, None] * cls
        return float((c > conf).sum()) / n_img

    lo, hi = -12.0, 6.0
    for _ in range(50):
        mid = (lo + hi) / 2
        if count(mid) > target_per_img:
            hi = mid
        else:
            lo = mid
    delta = (lo + hi) / 2
    det = model.model[-1]
    for conv in det.m:
        with torch.no_grad():
            conv.bias.view(det.na, det.no)[:, 4] += delta
    return delta


def rect_val_shape(h0: int, w0: int, img_size: int, stride: int = 32,
                   pad: float = 0.5):
    """The reference's rect-val canvas for one image (datasets.py:856-872 at
    batch_size=1): aspect ratio normalized to max side 1, scaled by img_size,
    ceil to stride multiples with +pad slack. Returns (h, w)."""
    ar = h0 / w0
    shape = [ar, 1.0] if ar < 1 else [1.0, 1.0 / ar]
    canvas = np.ceil(np.array(shape) * img_size / stride + pad).astype(int) * stride
    return int(canvas[0]), int(canvas[1])
