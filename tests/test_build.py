"""Model build + forward tests: every shipped reference config must assemble, and the
flagship must produce the expected pyramid shapes (SURVEY §3.4 shape walk)."""

import glob

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icafusion_tpu.config import load_model_config
from icafusion_tpu.models import build_model, resolve_model

FLAGSHIP = "/root/reference/models/transformer/yolov5l_Transfusion_FLIR.yaml"

# configs that are dead in the reference too (undefined modules — SURVEY §2.2)
DEAD = ("MobileViT", "weightedAdd", "GPT")


def all_two_stream_configs():
    return sorted(glob.glob("/root/reference/models/transformer/*.yaml"))


def test_flagship_parse(reference_dir):
    cfg = load_model_config(FLAGSHIP)
    assert cfg.nc == 3 and cfg.nl == 3 and cfg.na == 3
    assert cfg.is_two_stream
    resolved, save = resolve_model(cfg)
    assert len(resolved) == 38
    # dual-stream routing: layer 10 consumes the IR input
    assert resolved[10].f == -4
    # fusion blocks see [rgb, ir] feature pairs
    assert resolved[20].f == (4, 14) and resolved[20].module == "TransformerFusionBlock"
    # channel inference: P3/P4/P5 widths (yolov5l: width_multiple=1.0)
    assert resolved[4].c2 == 256 and resolved[6].c2 == 512 and resolved[9].c2 == 1024
    assert resolved[20].args[0] == 256 and resolved[22].args[0] == 1024
    assert resolved[-1].module == "Detect"
    assert resolved[-1].args[2] == (256, 512, 1024)


@pytest.mark.parametrize("path", [p for p in all_two_stream_configs()
                                  if not any(d in p for d in DEAD)])
def test_all_two_stream_configs_resolve(path, reference_dir):
    cfg = load_model_config(path)
    resolved, save = resolve_model(cfg)
    assert resolved[-1].module == "Detect"
    build_model(cfg)  # registry coverage


def test_dead_configs_rejected(reference_dir):
    with pytest.raises(ValueError, match="no definition"):
        load_model_config(
            "/root/reference/models/transformer/yolov5l_MobileViT_NiNfusion_FLIR.yaml")


def test_width_depth_multiples(reference_dir):
    cfg = load_model_config("/root/reference/models/transformer/yolov5s_Transfusion_FLIR.yaml")
    resolved, _ = resolve_model(cfg)
    # yolov5s: width 0.5, depth 0.33 -> first conv 32ch, C3 repeats 1
    assert resolved[0].args[1] == 32
    assert resolved[4].args[2] == 2  # round(6*0.33)=2 repeats in P3 C3
    assert resolved[9].c2 == 512


@pytest.mark.slow
def test_flagship_forward_shapes(reference_dir):
    # smallest size compatible with the (20,20)/(16,16)/(10,10) fusion grids is 320
    # (P5 = 320/32 = 10); reference AdaptivePool2d has the same constraint.
    cfg = load_model_config(
        "/root/reference/models/transformer/yolov5s_Transfusion_FLIR.yaml")
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 320, 320, 3), jnp.float32)
    variables = model.init({"params": rng}, x, x, train=False, decode=False)
    raw = model.apply(variables, x, x, train=False, decode=False)
    assert len(raw) == 3
    assert raw[0].shape == (1, 40, 40, 3, 8)   # 320/8, na=3, no=3+5
    assert raw[1].shape == (1, 20, 20, 3, 8)
    assert raw[2].shape == (1, 10, 10, 3, 8)

    pred, logits, raw2 = model.apply(variables, x, x, train=False, decode=True)
    n = (40 * 40 + 20 * 20 + 10 * 10) * 3
    assert pred.shape == (1, n, 8)
    assert logits.shape == (1, n, 3)
    # decoded boxes are in pixels and finite
    assert np.isfinite(np.asarray(pred)).all()


@pytest.mark.slow
def test_small_two_stream_train_mode(reference_dir):
    cfg = load_model_config("/root/reference/models/transformer/yolov5n_Transfusion_kaist.yaml")
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((2, 320, 320, 3), jnp.float32) * 0.5
    variables = model.init({"params": rng, "dropout": rng}, x, x, train=True, decode=False)
    assert "batch_stats" in variables
    raw, new_state = model.apply(
        variables, x, x, train=True, decode=False,
        rngs={"dropout": rng}, mutable=["batch_stats"])
    assert len(raw) == 3
    assert raw[0].shape[1] == 40  # 320/8


def test_single_stream_legacy_config(reference_dir):
    cfg = load_model_config("/root/reference/models/yolov5s.yaml")
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init({"params": rng}, x, train=False, decode=False)
    raw = model.apply(variables, x, train=False, decode=False)
    assert len(raw) == 3 and raw[0].shape == (1, 8, 8, 3, 85)
