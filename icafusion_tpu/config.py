"""Typed three-tier config system: architecture / dataset / hyperparameters.

The reference merges three YAML tiers at runtime (SURVEY §5.6; reference train.py:494-588):
  1. model YAML  — {nc, depth_multiple, width_multiple, anchors, backbone, head}
                   where backbone/head rows are [from, number, module, args] and the
                   module name string is eval()'d into a class (yolo_test.py:224-229).
  2. data YAML   — paired RGB/IR paths + nc + names (data/multispectral/*.yaml).
  3. hyp YAML    — 29 LR/loss/augmentation keys (data/hyp.scratch.yaml).

This module parses all three into frozen dataclasses and replaces the eval() DSL with a
string-keyed module registry lookup (resolved later in models/assembler.py). It ingests
the reference's shipped YAMLs unchanged, including torch-flavored names such as
``nn.Upsample``.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, List, Optional, Sequence, Tuple, Union

import numpy as np
import yaml

FromSpec = Union[int, Tuple[int, ...]]

# Module names appearing in reference YAMLs that have no definition anywhere in the
# reference tree (dead configs — SURVEY §2.2): fail fast with a clear message.
KNOWN_UNDEFINED = {"GPT", "weightedAdd", "MobileViTBlock"}

# torch-flavored YAML aliases -> registry names.
NAME_ALIASES = {
    "nn.Upsample": "Upsample",
    "nn.BatchNorm2d": "BatchNorm2d",
    "nn.MaxPool2d": "MaxPool2d",
}


@dataclasses.dataclass(frozen=True)
class LayerDef:
    """One row of the backbone/head list: [from, number, module, args].

    ``f == -4`` is the dual-input sentinel: the layer consumes the second (IR) input
    stream instead of a previous layer's output (reference yolo_test.py:154-156)."""
    i: int                 # layer index in the flattened backbone+head list
    f: FromSpec            # input source(s)
    n: int                 # repeat count (after depth_multiple)
    module: str            # registry name
    args: Tuple[Any, ...]  # raw YAML args (pre channel-inference)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    nc: int
    depth_multiple: float
    width_multiple: float
    anchors: Tuple[Tuple[float, ...], ...]   # (nl, na*2) pixel anchors per level
    layers: Tuple[LayerDef, ...]             # backbone + head, flattened
    ch: int = 3                              # input channels per stream
    name: str = "model"

    @property
    def nl(self) -> int:
        return len(self.anchors)

    @property
    def na(self) -> int:
        return len(self.anchors[0]) // 2

    @property
    def no(self) -> int:
        return self.na * (self.nc + 5)

    @property
    def is_two_stream(self) -> bool:
        return any(l.f == -4 for l in self.layers)


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Paired multispectral dataset description (data/multispectral/*.yaml)."""
    nc: int
    names: Tuple[str, ...]
    path: str = ""
    train_rgb: str = ""
    val_rgb: str = ""
    test_rgb: str = ""
    train_ir: str = ""
    val_ir: str = ""
    test_ir: str = ""


# The full hyperparameter schema with reference defaults (data/hyp.scratch.yaml).
_HYP_DEFAULTS = dict(
    lr0=0.01, lrf=0.1, momentum=0.937, weight_decay=0.0005,
    warmup_epochs=3.0, warmup_momentum=0.8, warmup_bias_lr=0.1,
    box=0.05, cls=0.5, cls_pw=1.0, obj=1.0, obj_pw=1.0,
    iou_t=0.20, anchor_t=4.0, fl_gamma=0.0, label_smoothing=0.0,
    hsv_h=0.015, hsv_s=0.7, hsv_v=0.4,
    degrees=0.0, translate=0.1, scale=0.5, shear=0.0, perspective=0.0,
    flipud=0.0, fliplr=0.5, mosaic=1.0, mixup=0.0, anchors=0.0,
)


@dataclasses.dataclass(frozen=True)
class HypConfig:
    lr0: float = 0.01
    lrf: float = 0.1
    momentum: float = 0.937
    weight_decay: float = 0.0005
    warmup_epochs: float = 3.0
    warmup_momentum: float = 0.8
    warmup_bias_lr: float = 0.1
    box: float = 0.05
    cls: float = 0.5
    cls_pw: float = 1.0
    obj: float = 1.0
    obj_pw: float = 1.0
    iou_t: float = 0.20
    anchor_t: float = 4.0
    fl_gamma: float = 0.0
    label_smoothing: float = 0.0
    hsv_h: float = 0.015
    hsv_s: float = 0.7
    hsv_v: float = 0.4
    degrees: float = 0.0
    translate: float = 0.1
    scale: float = 0.5
    shear: float = 0.0
    perspective: float = 0.0
    flipud: float = 0.0
    fliplr: float = 0.5
    mosaic: float = 1.0
    mixup: float = 0.0
    anchors: float = 0.0

    def replace(self, **kw) -> "HypConfig":
        return dataclasses.replace(self, **kw)

    def as_dict(self) -> dict:
        return dataclasses.asdict(self)


# ---------------------------------------------------------------------------
# Bare config-name resolution (reference check_file glob semantics,
# utils/general.py:149-160: a bare filename is searched for anywhere in the
# tree so `--cfg yolov5n_Transfusion_FLIR.yaml` just works).  Here bare names
# resolve against the shipped presets under configs/{models,data,hyp}; the
# reference's per-dataset model files (<base>_<DATASET>.yaml, which differ
# from <base>.yaml only in nc) map to the dataset-agnostic preset plus an nc
# override taken from this table (each value matches the nc the corresponding
# reference YAML declares).
# ---------------------------------------------------------------------------

_CONFIGS_ROOT = Path(__file__).resolve().parents[1] / "configs"

_MODEL_DATASET_NC = {
    "FLIR": 3,       # models/transformer/yolov5l_Transfusion_FLIR.yaml:2
    "kaist": 1,      # models/transformer/yolov5l_Transfusion_kaist.yaml:2
    "VEDAI": 9,      # models/transformer/yolov5l_Transfusion_VEDAI.yaml:2
    "LLVIP": 1,      # models/transformer/yolov5l_Transfusion_LLVIP.yaml:2
    "SeaDrone": 7,   # models/transformer/yolov5m_Transfusion_SeaDrone.yaml:2
    "CVC14": 1,      # data/multispectral/CVC14.yaml (names: ['person'])
}


def _norm_stem(name: str) -> str:
    return Path(name).stem.lower().replace("-", "_")


def resolve_model_yaml(spec) -> Tuple[Path, Optional[int]]:
    """Resolve a model-config spec to (yaml_path, nc_override).

    Accepts: an existing path; a bare preset name (`yolov5s_Transfusion.yaml`);
    or a reference-style per-dataset name (`yolov5n_Transfusion_FLIR.yaml`),
    which maps to the dataset-agnostic preset with the dataset's nc."""
    p = Path(spec)
    if p.exists():
        return p, None
    models_dir = _CONFIGS_ROOT / "models"
    cand = models_dir / p.name
    if cand.exists():
        return cand, None
    stem = p.stem
    for suffix, nc in _MODEL_DATASET_NC.items():
        if stem.lower().endswith("_" + suffix.lower()):
            base = stem[: -(len(suffix) + 1)]
            cand = models_dir / (base + ".yaml")
            if cand.exists():
                return cand, nc
    # last resort: normalized-stem match anywhere under configs/
    want = _norm_stem(spec)
    for f in sorted(_CONFIGS_ROOT.rglob("*.yaml")):
        if _norm_stem(f.name) == want:
            return f, None
    raise FileNotFoundError(
        f"model config '{spec}' not found (searched as a path, under "
        f"{models_dir}, and as a reference-style <base>_<DATASET>.yaml name)")


def resolve_data_yaml(spec) -> Path:
    """Resolve a data-config spec: an existing path, a preset filename under
    configs/data/, or a reference data YAML name (`FLIR-align-3class.yaml` →
    configs/data/flir_align_3class.yaml via case/hyphen-insensitive stems)."""
    p = Path(spec)
    if p.exists():
        return p
    data_dir = _CONFIGS_ROOT / "data"
    cand = data_dir / p.name
    if cand.exists():
        return cand
    want = _norm_stem(spec)
    for f in sorted(data_dir.glob("*.yaml")):
        if _norm_stem(f.name) == want:
            return f
    raise FileNotFoundError(
        f"data config '{spec}' not found (searched as a path and under {data_dir})")


def resolve_hyp_yaml(spec) -> Path:
    p = Path(spec)
    if p.exists():
        return p
    cand = _CONFIGS_ROOT / "hyp" / p.name
    if cand.exists():
        return cand
    raise FileNotFoundError(
        f"hyp config '{spec}' not found (searched as a path and under "
        f"{_CONFIGS_ROOT / 'hyp'})")


def _norm_from(f) -> FromSpec:
    if isinstance(f, list):
        return tuple(int(x) for x in f)
    return int(f)


def _norm_module_name(m: str) -> str:
    m = str(m)
    if m in KNOWN_UNDEFINED:
        raise ValueError(
            f"Module '{m}' appears in the config but has no definition in the reference "
            f"either (dead config — SURVEY §2.2); refusing to build.")
    return NAME_ALIASES.get(m, m)


# YAML arg strings the reference resolves via eval() (yolo_test.py:225-229).
_ARG_LITERALS = {"None": None, "True": True, "False": False,
                 "nearest": "nearest", "bilinear": "bilinear",
                 "nc": "__NC__", "anchors": "__ANCHORS__"}


def _norm_arg(a, nc, anchors):
    if isinstance(a, str):
        if a == "nc":
            return nc
        if a == "anchors":
            return anchors
        if a in ("None",):
            return None
        if a in ("True",):
            return True
        if a in ("False",):
            return False
        return a  # e.g. 'nearest'
    if isinstance(a, list):
        return tuple(_norm_arg(x, nc, anchors) for x in a)
    return a


def load_model_config(path_or_dict, nc: Optional[int] = None,
                      anchors=None, ch: int = 3) -> ModelConfig:
    """Parse a model-architecture YAML into a ModelConfig.

    Mirrors Model.__init__'s yaml handling incl. nc/anchors overrides
    (reference yolo_test.py:75-94), with eval() replaced by literal/name mapping."""
    if isinstance(path_or_dict, (str, Path)):
        path, suffix_nc = resolve_model_yaml(path_or_dict)
        if nc is None and suffix_nc is not None:
            nc = suffix_nc
        name = Path(path_or_dict).stem
        with open(path) as f:
            d = yaml.safe_load(f)
    else:
        d = dict(path_or_dict)
        name = d.get("name", "model")

    cfg_nc = int(d["nc"])
    if nc is not None and nc != cfg_nc:
        cfg_nc = int(nc)
    cfg_anchors = d["anchors"] if anchors is None else anchors
    if isinstance(cfg_anchors, int):
        # 'anchors: N' means N auto-anchors per level; placeholder wh pairs
        # (reference yolo_test.py:274-275 builds dummy ranges the same way).
        nl_guess = 3
        cfg_anchors = [list(range(2 * cfg_anchors))] * nl_guess
    anchors_t = tuple(tuple(float(x) for x in row) for row in cfg_anchors)

    gd, gw = float(d["depth_multiple"]), float(d["width_multiple"])
    rows = list(d["backbone"]) + list(d["head"])
    layers = []
    for i, (f, n, m, args) in enumerate(rows):
        layers.append(LayerDef(
            i=i,
            f=_norm_from(f),
            n=int(n),
            module=_norm_module_name(m),
            args=tuple(_norm_arg(a, cfg_nc, anchors_t) for a in args),
        ))
    return ModelConfig(nc=cfg_nc, depth_multiple=gd, width_multiple=gw,
                       anchors=anchors_t, layers=tuple(layers),
                       ch=int(d.get("ch", ch)), name=name)


def with_anchors(cfg: ModelConfig, anchors) -> ModelConfig:
    """New ModelConfig with replaced anchors (autoanchor result —
    reference autoanchor.py:55-58 writes them back into the Detect module)."""
    anchors_t = tuple(tuple(float(x) for x in row)
                      for row in np.asarray(anchors).reshape(cfg.nl, -1))
    layers = []
    for l in cfg.layers:
        if l.module == "Detect":
            args = (l.args[0], anchors_t) + tuple(l.args[2:])
            l = dataclasses.replace(l, args=args)
        layers.append(l)
    return dataclasses.replace(cfg, anchors=anchors_t, layers=tuple(layers))


def load_data_config(path) -> DataConfig:
    with open(resolve_data_yaml(path)) as f:
        d = yaml.safe_load(f)
    names = d.get("names", [])
    nc = int(d.get("nc", len(names)))
    if names and len(names) != nc:
        raise ValueError(f"data config {path}: len(names)={len(names)} != nc={nc}")
    return DataConfig(
        nc=nc, names=tuple(str(n) for n in names),
        path=str(d.get("path", "")),
        train_rgb=str(d.get("train_rgb", d.get("train", ""))),
        val_rgb=str(d.get("val_rgb", d.get("val", ""))),
        test_rgb=str(d.get("test_rgb", d.get("test", ""))),
        train_ir=str(d.get("train_ir", "")),
        val_ir=str(d.get("val_ir", "")),
        test_ir=str(d.get("test_ir", "")),
    )


def load_hyp_config(path=None, **overrides) -> HypConfig:
    d = dict(_HYP_DEFAULTS)
    if path is not None:
        with open(resolve_hyp_yaml(path)) as f:
            loaded = yaml.safe_load(f) or {}
        unknown = set(loaded) - set(_HYP_DEFAULTS)
        if unknown:
            # tolerate extra keys (e.g. evolved-hyp files) but surface them
            print(f"hyp config {path}: ignoring unknown keys {sorted(unknown)}")
        d.update({k: v for k, v in loaded.items() if k in _HYP_DEFAULTS})
    d.update(overrides)
    return HypConfig(**d)
