"""Model zoo: programmatic, typed factories for every architecture family the
reference ships as YAML (SURVEY §5.6: 32 configs = {Transfusion(DMFF), NiNfusion,
Add} x {CSPDarknet, VGG16, ResNet50} x scale n/s/m/l/x).

These build the same layer graphs as the reference's models/transformer/*.yaml but
as code — the framework is standalone (no reference tree needed at run time), and a
factory call replaces hand-edited YAML. Reference YAMLs still load unchanged through
config.load_model_config for parity testing.

Scale multipliers follow yolov5 conventions (yolov5n..x; e.g.
yolov5s_Transfusion_kaist.yaml: depth 0.33 / width 0.50).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from icafusion_tpu.config import ModelConfig, load_model_config

SCALES = {
    "n": (0.33, 0.25),
    "s": (0.33, 0.50),
    "m": (0.67, 0.75),
    "l": (1.00, 1.00),
    "x": (1.33, 1.25),
}

COCO_ANCHORS = ((10, 13, 16, 30, 33, 23),
                (30, 61, 62, 45, 59, 119),
                (116, 90, 156, 198, 373, 326))

# DMFF pooled-grid sizes per pyramid level at 640 input
# (yolov5l_Transfusion_FLIR.yaml:39-41)
TFB_GRIDS = ((20, 20), (16, 16), (10, 10))


def _csp_tower(first_from: int) -> List[list]:
    """One CSPDarknet-v5 tower: 10 rows Conv/C3/SPPF ending at P5+SPPF
    (yolov5l_Transfusion_FLIR.yaml:16-25)."""
    return [
        [first_from, 1, "Conv", [64, 6, 2, 2]],     # P1/2
        [-1, 1, "Conv", [128, 3, 2]],                # P2/4
        [-1, 3, "C3", [128]],
        [-1, 1, "Conv", [256, 3, 2]],                # P3/8
        [-1, 6, "C3", [256]],
        [-1, 1, "Conv", [512, 3, 2]],                # P4/16
        [-1, 9, "C3", [512]],
        [-1, 1, "Conv", [1024, 3, 2]],               # P5/32
        [-1, 3, "C3", [1024]],
        [-1, 1, "SPPF", [1024, 5]],
    ]


def _panet_head(p3: int, p4: int, p5: int, widths=(512, 256),
                p5_out: int = None) -> List[list]:
    """PANet top-down + bottom-up neck + Detect, generic over fusion indices
    (yolov5l_Transfusion_FLIR.yaml:47-65). p5_out: channels of the final
    bottom-up C3 — defaults to 2*w1 (CSP/ResNet50 families); the reference's
    VGG16 heads cap it at 512 (yolov5_VGG16_*_FLIR.yaml last C3 row)."""
    w1, w2 = widths
    p5_out = 2 * w1 if p5_out is None else p5_out
    base = p5 + 1
    return [
        [-1, 1, "Conv", [w1, 1, 1]],                        # base+0
        [-1, 1, "Upsample", ["None", 2, "nearest"]],        # base+1
        [[-1, p4], 1, "Concat", [1]],                       # base+2
        [-1, 3, "C3", [w1, "False"]],                       # base+3

        [-1, 1, "Conv", [w2, 1, 1]],                        # base+4
        [-1, 1, "Upsample", ["None", 2, "nearest"]],        # base+5
        [[-1, p3], 1, "Concat", [1]],                       # base+6
        [-1, 3, "C3", [w2, "False"]],                       # base+7  P3 out

        [-1, 1, "Conv", [w2, 3, 2]],                        # base+8
        [[-1, base + 4], 1, "Concat", [1]],                 # base+9
        [-1, 3, "C3", [w1, "False"]],                       # base+10 P4 out

        [-1, 1, "Conv", [w1, 3, 2]],                        # base+11
        [[-1, base + 0], 1, "Concat", [1]],                 # base+12
        [-1, 3, "C3", [p5_out, "False"]],                   # base+13 P5 out

        [[base + 7, base + 10, base + 13], 1, "Detect", ["nc", "anchors"]],
    ]


def _fusion_stride(kind: str) -> int:
    """Rows emitted per fusion site (dmaf expands to a 4-row block)."""
    return 4 if kind == "dmaf" else 1


def _fusion_rows(kind: str, pairs: Sequence[Tuple[int, int]],
                 dims: Sequence[int]) -> List[list]:
    rows = []
    for (a, b), d, (vh, hz) in zip(pairs, dims, TFB_GRIDS):
        if kind == "tfb":
            rows.append([[a, b], 1, "TransformerFusionBlock", [d, vh, hz]])
        elif kind == "nin":
            rows.append([[a, b], 1, "NiNfusion", [1, 1]])
        elif kind == "add":
            rows.append([[a, b], 1, "Add", [1]])
        elif kind == "dmaf":
            # differential modality gating (common.py:363-383): enhance each
            # stream with the cross-gated difference maps via Add2
            # (yolo.py's registered DMAF/Add2 wiring, unused by any shipped
            # reference YAML), then blend the enhanced streams for the head
            rows += [
                [[a, b], 1, "DMAF", [d]],
                [[a, -1], 1, "Add2", [d, 0]],
                [[b, -2], 1, "Add2", [d, 1]],
                [[-2, -1], 1, "Add", [d]],
            ]
        else:
            raise ValueError(f"unknown fusion kind {kind!r}")
    return rows


def icafusion_config(scale: str = "l", nc: int = 3, fusion: str = "tfb",
                     anchors=COCO_ANCHORS, name: str = "") -> ModelConfig:
    """Two-stream CSPDarknet + fusion + PANet — the ICAFusion detector family.

    fusion: 'tfb' (DMFF dual cross-attention — the paper's model), 'nin'
    (concat+1x1), 'add' (fixed blend), or 'dmaf' (differential gating).
    Equivalent graphs to the reference's
    yolov5{scale}_{Transfusion,NiNfusion,Add}_*.yaml."""
    gd, gw = SCALES[scale]
    rows = _csp_tower(-1) + _csp_tower(-4)
    rows += _fusion_rows(fusion, pairs=[(4, 14), (6, 16), (9, 19)],
                         dims=[256, 512, 1024])
    k, base = _fusion_stride(fusion), 20
    rows += _panet_head(p3=base + k - 1, p4=base + 2 * k - 1,
                        p5=base + 3 * k - 1)
    d = dict(nc=nc, depth_multiple=gd, width_multiple=gw, anchors=list(anchors),
             backbone=rows[:base + 3 * k], head=rows[base + 3 * k:],
             name=name or f"icafusion_{fusion}_{scale}")
    return load_model_config(d, nc=nc)


def tiny_icafusion_config(nc: int = 3, fusion: str = "tfb") -> ModelConfig:
    """Micro two-stream model (same graph family as icafusion_config) for smoke
    tests and multi-chip dry runs: ~0.2M params, works at imgsz 64+ (TFB grids
    (4,4)/(4,4)/(2,2)). Not a reference architecture."""
    tower = lambda f: [
        [f, 1, "Conv", [16, 6, 2, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "C3", [32]],
        [-1, 1, "Conv", [48, 3, 2]],     # P3/8
        [-1, 1, "C3", [48]],
        [-1, 1, "Conv", [64, 3, 2]],     # P4/16
        [-1, 1, "C3", [64]],
        [-1, 1, "Conv", [96, 3, 2]],     # P5/32
        [-1, 1, "SPPF", [96, 5]],
    ]
    rows = tower(-1) + tower(-4)
    if fusion == "tfb":
        rows += [
            [[4, 13], 1, "TransformerFusionBlock", [48, 4, 4]],
            [[6, 15], 1, "TransformerFusionBlock", [64, 4, 4]],
            [[8, 17], 1, "TransformerFusionBlock", [96, 2, 2]],
        ]
    else:
        rows += _fusion_rows(fusion, pairs=[(4, 13), (6, 15), (8, 17)],
                             dims=[48, 64, 96])
    k, base = _fusion_stride(fusion), 18
    rows += _panet_head(p3=base + k - 1, p4=base + 2 * k - 1,
                        p5=base + 3 * k - 1, widths=(64, 48))
    d = dict(nc=nc, depth_multiple=1.0, width_multiple=1.0,
             anchors=list(COCO_ANCHORS), backbone=rows[:base + 3 * k],
             head=rows[base + 3 * k:], name=f"icafusion_tiny_{fusion}")
    return load_model_config(d, nc=nc)


def vgg16_icafusion_config(nc: int = 3, fusion: str = "tfb", anchors=COCO_ANCHORS) -> ModelConfig:
    """Two-stream VGG16 variant (yolov5_VGG16_Transfusion_FLIR.yaml)."""
    tower = lambda f: [
        [f, 1, "VGGblock", [2, 3, 64]],
        [-1, 1, "VGGblock", [2, 64, 128]],
        [-1, 1, "VGGblock", [3, 128, 256]],
        [-1, 1, "VGGblock", [3, 256, 512]],
        [-1, 1, "VGGblock", [3, 512, 512]],
    ]
    rows = tower(-1) + tower(-4)
    rows += _fusion_rows(fusion, pairs=[(2, 7), (3, 8), (4, 9)], dims=[256, 512, 512])
    k, base = _fusion_stride(fusion), 10
    rows += _panet_head(p3=base + k - 1, p4=base + 2 * k - 1,
                        p5=base + 3 * k - 1, p5_out=512)
    d = dict(nc=nc, depth_multiple=1.0, width_multiple=1.0, anchors=list(anchors),
             backbone=rows[:base + 3 * k], head=rows[base + 3 * k:],
             name=f"icafusion_vgg16_{fusion}")
    return load_model_config(d, nc=nc)


def resnet50_icafusion_config(nc: int = 3, fusion: str = "tfb", anchors=COCO_ANCHORS) -> ModelConfig:
    """Two-stream ResNet50 variant (yolov5_ResNet50_Transfusion_FLIR.yaml)."""
    tower = lambda f: [
        [f, 1, "ResNetlayer", [3, 64, 1, "True", 1]],
        [-1, 1, "ResNetlayer", [64, 64, 1, "False", 3]],
        [-1, 1, "ResNetlayer", [256, 128, 2, "False", 4]],
        [-1, 1, "ResNetlayer", [512, 256, 2, "False", 6]],
        [-1, 1, "ResNetlayer", [1024, 512, 2, "False", 3]],
    ]
    rows = tower(-1) + tower(-4)
    rows += _fusion_rows(fusion, pairs=[(2, 7), (3, 8), (4, 9)],
                         dims=[512, 1024, 2048])
    k, base = _fusion_stride(fusion), 10
    rows += _panet_head(p3=base + k - 1, p4=base + 2 * k - 1,
                        p5=base + 3 * k - 1, widths=(1024, 512))
    d = dict(nc=nc, depth_multiple=1.0, width_multiple=1.0, anchors=list(anchors),
             backbone=rows[:base + 3 * k], head=rows[base + 3 * k:],
             name=f"icafusion_resnet50_{fusion}")
    return load_model_config(d, nc=nc)
