"""Multi-device serving and evaluation over the 8-virtual-device CPU mesh:
the inference-side SPMD counterpart of the train-step coverage in
test_train_step.py (reference DDP covers only training; serving/eval sharding
is the rebuild's north-star deployment path, SURVEY §5.8)."""

import jax
import numpy as np
import pytest

from icafusion_tpu.models import build_model
from icafusion_tpu.models.zoo import tiny_icafusion_config


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_icafusion_config(nc=3)
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    x = rng.random((1, 64, 64, 3)).astype(np.float32)
    variables = jax.jit(model.init, static_argnames=("train", "decode"))(
        {"params": jax.random.PRNGKey(0)}, x, x, train=False, decode=False)
    return model, variables


def test_serving_engine_sharded_over_8_devices(tiny_model):
    from icafusion_tpu.serve.engine import ServingEngine
    model, variables = tiny_model
    assert len(jax.devices()) == 8
    eng = ServingEngine(model=model, variables=dict(variables), img_size=64,
                        batch_size=8, n_devices=8, conf_thres=0.001)
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 255, (5, 64, 64, 3), dtype=np.uint8)
    ir = rng.integers(0, 255, (5, 64, 64, 3), dtype=np.uint8)
    out = eng.predict_arrays(rgb, ir)
    assert len(out) == 5
    assert all(o.ndim == 2 and o.shape[1] == 6 for o in out)


def test_serving_engine_rect_canvas(tiny_model):
    """img_size=(H, W): the engine serves the minimal-rectangle geometry the
    rect CLIs use (BENCH.md round-4: 512x640 measured 1.20x the square) —
    detections come back in native coords via the rect letterbox inverse."""
    from icafusion_tpu.serve.engine import ServingEngine
    model, variables = tiny_model
    eng = ServingEngine(model=model, variables=dict(variables),
                        img_size=(64, 96), batch_size=8, n_devices=8,
                        conf_thres=0.001)
    assert eng.canvas == (64, 96)
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 255, (3, 64, 96, 3), dtype=np.uint8)
    ir = rng.integers(0, 255, (3, 64, 96, 3), dtype=np.uint8)
    out = eng.predict_arrays(rgb, ir, orig_hw=[(128, 192)] * 3)
    assert len(out) == 3
    for o in out:
        assert o.ndim == 2 and o.shape[1] == 6
        if len(o):  # rescaled to the 128x192 native frame, not the canvas
            assert (o[:, [0, 2]] <= 192 + 1e-3).all()
            assert (o[:, [1, 3]] <= 128 + 1e-3).all()


def test_evaluator_sharded_over_8_devices(tiny_model):
    from icafusion_tpu.eval.evaluator import Evaluator
    model, variables = tiny_model
    ev8 = Evaluator(model=model, nc=3, n_devices=8)
    ev1 = Evaluator(model=model, nc=3)
    rng = np.random.default_rng(2)

    def batches():
        for _ in range(2):
            rgb = rng.integers(0, 255, (8, 64, 64, 3), dtype=np.uint8)
            ir = rng.integers(0, 255, (8, 64, 64, 3), dtype=np.uint8)
            labels = [np.array([[0, 0.5, 0.5, 0.4, 0.4]], np.float32)
                      for _ in range(8)]
            shapes = [((64, 64), ((1.0, 1.0), (0.0, 0.0)))] * 8
            yield {"rgb": rgb, "ir": ir, "labels": labels, "shapes": shapes,
                   "count": 8, "paths": [f"i{k}" for k in range(8)]}

    rng = np.random.default_rng(2)
    out8 = ev8.run(dict(variables), batches(), 64)
    rng = np.random.default_rng(2)
    out1 = ev1.run(dict(variables), batches(), 64)
    # sharded eval must reproduce the single-device metrics exactly
    assert out8["seen"] == out1["seen"] == 16
    np.testing.assert_allclose(out8["map50"], out1["map50"], atol=1e-6)
    np.testing.assert_allclose(out8["map"], out1["map"], atol=1e-6)


def test_evaluator_confluence_sharded_matches_single(tiny_model):
    """confluence eval over the mesh: the jitted program returns the raw
    decoded predictions SHARDED on the data axis; device_get must assemble
    the global array before the host-side clustering — sharded and
    single-device runs must agree exactly."""
    from icafusion_tpu.eval.evaluator import Evaluator
    model, variables = tiny_model
    ev8 = Evaluator(model=model, nc=3, n_devices=8, conf_thres=0.1,
                    confluence=True)
    ev1 = Evaluator(model=model, nc=3, conf_thres=0.1, confluence=True)

    def batches():
        rng = np.random.default_rng(5)
        rgb = rng.integers(0, 255, (8, 64, 64, 3), dtype=np.uint8)
        ir = rng.integers(0, 255, (8, 64, 64, 3), dtype=np.uint8)
        labels = [np.array([[0, 0.5, 0.5, 0.4, 0.4]], np.float32)
                  for _ in range(8)]
        shapes = [((64, 64), ((1.0, 1.0), (0.0, 0.0)))] * 8
        yield {"rgb": rgb, "ir": ir, "labels": labels, "shapes": shapes,
               "count": 8, "paths": [f"i{k}" for k in range(8)]}

    out8 = ev8.run(dict(variables), batches(), 64)
    out1 = ev1.run(dict(variables), batches(), 64)
    assert out8["seen"] == out1["seen"] == 8
    np.testing.assert_allclose(out8["map50"], out1["map50"], atol=1e-6)
    np.testing.assert_allclose(out8["map"], out1["map"], atol=1e-6)


def test_resolve_accum_rule():
    from icafusion_tpu.cli.train import resolve_accum
    assert resolve_accum(None, 8) == 1
    assert resolve_accum("auto", 8) == 8      # round(64/8)
    assert resolve_accum("auto", 16) == 4
    assert resolve_accum("auto", 48) == 1     # round(64/48)=1
    assert resolve_accum("3", 8) == 3
    assert resolve_accum(2, 8) == 2


@pytest.mark.slow
def test_fit_with_accumulation(tmp_path):
    """accum_steps=2: the loader yields 2*B batches; the scan inside the step
    averages microbatch losses; results.csv rows must appear normally."""
    from tests.test_fit_driver import _make_disk_dataset
    from icafusion_tpu.config import DataConfig, load_hyp_config
    from icafusion_tpu.train.fit import FitConfig, fit

    _make_disk_dataset(tmp_path / "data", n=8)
    data_cfg = DataConfig(nc=2, names=("a", "b"), path=str(tmp_path / "data"),
                          train_rgb="visible/train", val_rgb="visible/train",
                          train_ir="infrared/train", val_ir="infrared/train")
    result = fit(FitConfig(
        model_cfg=__import__("icafusion_tpu.models.zoo",
                             fromlist=["z"]).tiny_icafusion_config(nc=2),
        data_cfg=data_cfg, hyp=load_hyp_config(None), epochs=1, batch_size=4,
        imgsz=96, project=str(tmp_path / "runs"), name="accum",
        autoanchor=False, workers=0, warmup_min_steps=2, max_targets=16,
        n_devices=4, accum_steps=2))
    import csv
    from pathlib import Path
    rows = list(csv.DictReader(open(Path(result["run_dir"]) / "results.csv")))
    assert len(rows) == 1 and float(rows[0]["lobj"]) > 0


def test_serving_engine_int8_quantized_over_8_devices(tiny_model):
    """engine.quantize() switches to the W8A8 path; detections stay sane and
    batch-sharded execution still works on the virtual mesh."""
    from icafusion_tpu.serve.engine import ServingEngine
    model, variables = tiny_model
    eng = ServingEngine(model=model, variables=dict(variables), img_size=64,
                        batch_size=8, n_devices=8, conf_thres=0.001)
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 255, (8, 64, 64, 3), dtype=np.uint8)
    ir = rng.integers(0, 255, (8, 64, 64, 3), dtype=np.uint8)
    fp_out = eng.predict_arrays(rgb, ir)
    eng.quantize([(rgb, ir)])
    assert "quant" in jax.tree_util.tree_structure(eng.variables).node_data()[1] \
        or "quant" in eng.variables
    q_out = eng.predict_arrays(rgb, ir)
    assert len(q_out) == len(fp_out) == 8
    assert all(o.ndim == 2 and o.shape[1] == 6 for o in q_out)


def test_fit_non_main_process_writes_nothing(tmp_path, monkeypatch):
    """SUPPLEMENT to the real 2-process cluster proof (tests/test_multihost.py
    + tools/multihost_train.py, which launch genuine jax.distributed
    processes): this quick monkeypatch covers only the is_main write-gating
    (fit.py, reference train.py rank in [-1,0]) — a non-zero process_index
    must train but emit NO run-dir artifacts."""
    from tests.test_fit_driver import _make_disk_dataset
    from icafusion_tpu.config import DataConfig, load_hyp_config
    from icafusion_tpu.models.zoo import tiny_icafusion_config
    from icafusion_tpu.train import fit as fit_mod
    from icafusion_tpu.train.fit import FitConfig, fit

    _make_disk_dataset(tmp_path / "data", n=8)
    data_cfg = DataConfig(nc=2, names=("a", "b"), path=str(tmp_path / "data"),
                          train_rgb="visible/train", val_rgb="visible/train",
                          train_ir="infrared/train", val_ir="infrared/train")
    monkeypatch.setattr(fit_mod.jax, "process_index", lambda: 1)
    result = fit(FitConfig(
        model_cfg=tiny_icafusion_config(nc=2), data_cfg=data_cfg,
        hyp=load_hyp_config(None), epochs=1, batch_size=4, imgsz=96,
        project=str(tmp_path / "runs"), name="rank1", autoanchor=False,
        workers=0, warmup_min_steps=2, max_targets=16, n_devices=4))
    assert "map50" in result
    run_dir = tmp_path / "runs" / "rank1"
    leftovers = list(run_dir.rglob("*")) if run_dir.exists() else []
    # the label cache is per-HOST by design (each host caches its own
    # dataset view — the reference's rank-0-first guard assumes shared disk)
    files = [p for p in leftovers
             if p.is_file() and ".cache" not in p.parts]
    assert not files, files


def test_predict_paths_pipeline_matches_serial(tiny_model, tmp_path):
    """The pipelined predict_paths (decode prefetch + deferred device fetch)
    must return the same ordered detections as the strictly serial loop,
    across multiple batches including a ragged tail."""
    from icafusion_tpu.data import native
    if not native.available():
        pytest.skip("native library not built")
    import cv2

    from icafusion_tpu.serve.engine import ServingEngine

    model, variables = tiny_model
    rng = np.random.default_rng(3)
    rgb_paths, ir_paths = [], []
    for i in range(5):  # batch_size=2 -> 3 batches, last ragged
        img = rng.integers(0, 255, (48, 72, 3), np.uint8)
        p1, p2 = str(tmp_path / f"r{i}.jpg"), str(tmp_path / f"i{i}.jpg")
        cv2.imwrite(p1, img, [cv2.IMWRITE_JPEG_QUALITY, 98])
        cv2.imwrite(p2, img[:, ::-1], [cv2.IMWRITE_JPEG_QUALITY, 98])
        rgb_paths.append(p1)
        ir_paths.append(p2)

    eng = ServingEngine(model=model, variables=dict(variables), img_size=64,
                        batch_size=2, conf_thres=0.001)
    serial = eng.predict_paths(rgb_paths, ir_paths, pipeline=False)
    piped = eng.predict_paths(rgb_paths, ir_paths, pipeline=True)
    assert len(serial) == len(piped) == 5
    for a, b in zip(serial, piped):
        np.testing.assert_array_equal(a, b)
