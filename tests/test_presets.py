"""The shipped configs/ presets make the framework standalone: every model
YAML parses back to its zoo-factory ModelConfig, every dataset template and
hyp set loads through the typed config system."""

import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT / "tools"))

from icafusion_tpu.config import (HypConfig, load_data_config,  # noqa: E402
                                  load_hyp_config)


def test_model_yamls_match_zoo():
    from gen_model_yamls import all_configs

    from icafusion_tpu.config import load_model_config
    for fname, cfg, _ in all_configs():
        path = ROOT / "configs" / "models" / fname
        assert path.is_file(), f"missing generated preset {fname}"
        back = load_model_config(str(path), nc=cfg.nc)
        assert back.layers == cfg.layers, fname
        assert back.anchors == cfg.anchors, fname
        assert (back.depth_multiple, back.width_multiple) == \
            (cfg.depth_multiple, cfg.width_multiple), fname


def test_hyp_presets_load():
    scratch = load_hyp_config(str(ROOT / "configs/hyp/hyp.scratch.yaml"))
    assert scratch == HypConfig(), \
        "hyp.scratch.yaml must equal the code defaults"
    vedai = load_hyp_config(str(ROOT / "configs/hyp/hyp.scratch_VEDAI.yaml"))
    assert vedai == HypConfig().replace(mosaic=0.0)
    fine = load_hyp_config(str(ROOT / "configs/hyp/hyp.finetune.yaml"))
    assert fine.momentum == pytest.approx(0.843)
    assert fine.mixup == pytest.approx(0.243)


def test_data_presets_load():
    expect = {"flir_align_3class": (3, "person"), "flir_align": (1, "person"),
              "kaist": (1, "person"), "llvip": (1, "person"),
              "cvc14": (1, "person"), "vedai": (9, "car")}
    for stem, (nc, first) in expect.items():
        dc = load_data_config(str(ROOT / f"configs/data/{stem}.yaml"))
        assert dc.nc == nc and dc.names[0] == first, stem
        assert dc.train_rgb and dc.val_ir


def test_model_preset_builds():
    import jax
    import jax.numpy as jnp

    from icafusion_tpu.config import load_model_config
    from icafusion_tpu.models import build_model
    cfg = load_model_config(
        str(ROOT / "configs/models/yolov5n_NiNfusion.yaml"), nc=1)
    model = build_model(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(model.init, static_argnames=("train", "decode"))(
        {"params": jax.random.PRNGKey(0)}, x, x, train=False, decode=False)
    maps = model.apply(v, x, x, train=False, decode=False)
    assert len(maps) == 3


def test_bare_name_resolution():
    """Reference check_file semantics (general.py:149-160): bare config names
    work in every loader. Per-dataset reference model names resolve to the
    dataset-agnostic preset with the dataset's nc."""
    from icafusion_tpu.config import (load_model_config, resolve_data_yaml,
                                      resolve_hyp_yaml, resolve_model_yaml)

    # reference-style model name -> preset + nc from suffix table
    path, nc = resolve_model_yaml("yolov5n_Transfusion_FLIR.yaml")
    assert path.name == "yolov5n_Transfusion.yaml" and nc == 3
    path, nc = resolve_model_yaml("yolov5l_Transfusion_kaist.yaml")
    assert path.name == "yolov5l_Transfusion.yaml" and nc == 1
    path, nc = resolve_model_yaml("yolov5_VGG16_Transfusion_FLIR.yaml")
    assert path.name == "yolov5_VGG16_Transfusion.yaml" and nc == 3
    # bare preset name, no suffix
    path, nc = resolve_model_yaml("yolov5s_Add.yaml")
    assert path.name == "yolov5s_Add.yaml" and nc is None

    mc = load_model_config("yolov5n_Transfusion_FLIR.yaml")
    assert mc.nc == 3 and mc.is_two_stream
    mc = load_model_config("yolov5n_Transfusion_kaist.yaml")
    assert mc.nc == 1
    # explicit nc wins over the suffix
    mc = load_model_config("yolov5n_Transfusion_FLIR.yaml", nc=9)
    assert mc.nc == 9

    # reference data YAML names -> shipped presets (case/hyphen-insensitive)
    assert resolve_data_yaml("FLIR-align-3class.yaml").name == \
        "flir_align_3class.yaml"
    assert resolve_data_yaml("kaist.yaml").name == "kaist.yaml"
    assert resolve_data_yaml("LLVIP.yaml").name == "llvip.yaml"
    assert resolve_hyp_yaml("hyp.scratch.yaml").name == "hyp.scratch.yaml"

    with pytest.raises(FileNotFoundError):
        resolve_model_yaml("yolov5z_NoSuch_FLIR.yaml")
    with pytest.raises(FileNotFoundError):
        resolve_data_yaml("no_such_dataset.yaml")


def test_zoo_matches_reference_yamls(reference_dir):
    """Every zoo factory builds the layer-list-identical graph to its
    reference YAML counterpart (caught live: the VGG16 head's final C3 is
    512-ch in the reference where the CSP family uses 2*w1)."""
    from icafusion_tpu.config import load_model_config
    from icafusion_tpu.models import zoo

    tdir = reference_dir / "models" / "transformer"
    pairs = []
    for scale in "nsml":
        for fusion, rname in (("tfb", "Transfusion"), ("nin", "NiNfusion"),
                              ("add", "Add")):
            for ds in ("FLIR", "kaist"):
                p = tdir / f"yolov5{scale}_{rname}_{ds}.yaml"
                if p.exists():
                    pairs.append((zoo.icafusion_config(scale, nc=3, fusion=fusion), p))
                    break
    for fusion, rname in (("tfb", "Transfusion"), ("nin", "NiNfusion")):
        pairs.append((zoo.vgg16_icafusion_config(nc=3, fusion=fusion),
                      tdir / f"yolov5_VGG16_{rname}_FLIR.yaml"))
        pairs.append((zoo.resnet50_icafusion_config(nc=3, fusion=fusion),
                      tdir / f"yolov5_ResNet50_{rname}_FLIR.yaml"))
    checked = 0
    for zc, path in pairs:
        if not path.exists():
            continue
        rc = load_model_config(str(path), nc=3)
        assert zc.layers == rc.layers, path.name
        assert (zc.depth_multiple, zc.width_multiple) == \
            (rc.depth_multiple, rc.width_multiple), path.name
        checked += 1
    assert checked >= 10, f"only {checked} reference YAMLs found to compare"
