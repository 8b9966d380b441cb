"""Training-driver behavior: epoch-mean loss logging and the run-dir artifact
set the reference emits (train.py:361-365 mosaics, plots.py:330 labels,
metrics.py:190-227 curves, plots.py:457 results.png, confusion matrix)."""

import csv
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest


def test_epoch_meter_is_true_mean():
    """results.csv loss columns must be epoch means of per-step losses, not the
    last batch's values (reference running mloss, train.py:288-359)."""
    from icafusion_tpu.train.fit import EpochMeter
    rng = np.random.default_rng(0)
    steps = [dict(lbox=jnp.asarray(v[0]), lobj=jnp.asarray(v[1]),
                  lcls=jnp.asarray(v[2]), loss=jnp.asarray(v[0] + v[1] + v[2]))
             for v in rng.random((5, 3)).astype(np.float32)]
    meter = EpochMeter()
    for m in steps:
        meter.add(m)
    expect = np.mean([[float(m[k]) for k in EpochMeter.KEYS] for m in steps], 0)
    np.testing.assert_allclose(meter.means(), expect, rtol=1e-6)
    # means, not the final step's values
    last = np.array([float(steps[-1][k]) for k in EpochMeter.KEYS])
    assert not np.allclose(meter.means(), last)


def _make_disk_dataset(root: Path, n: int, nc: int = 2, hw: int = 96):
    import cv2
    rng = np.random.default_rng(0)
    for sub in ("visible/train", "infrared/train", "labels/train"):
        (root / sub).mkdir(parents=True, exist_ok=True)
    for i in range(n):
        rgb = rng.integers(0, 40, (hw, hw, 3), dtype=np.uint8)
        ir = rng.integers(0, 30, (hw, hw, 3), dtype=np.uint8)
        lines = []
        for _ in range(int(rng.integers(1, 3))):
            bw = int(rng.uniform(0.2, 0.4) * hw)
            x1, y1 = int(rng.uniform(0, hw - bw)), int(rng.uniform(0, hw - bw))
            cls = int(rng.integers(0, nc))
            cv2.rectangle(rgb, (x1, y1), (x1 + bw, y1 + bw),
                          (255, 40, 40) if cls == 0 else (40, 255, 40), -1)
            cv2.rectangle(ir, (x1, y1), (x1 + bw, y1 + bw), (220, 220, 220), -1)
            lines.append(f"{cls} {(x1 + bw / 2) / hw:.6f} {(y1 + bw / 2) / hw:.6f} "
                         f"{bw / hw:.6f} {bw / hw:.6f}")
        cv2.imwrite(str(root / "visible/train" / f"i{i:03d}.jpg"), rgb[:, :, ::-1])
        cv2.imwrite(str(root / "infrared/train" / f"i{i:03d}.jpg"), ir[:, :, ::-1])
        (root / "labels/train" / f"i{i:03d}.txt").write_text("\n".join(lines) + "\n")


@pytest.mark.slow
def test_fit_run_dir_artifacts(tmp_path):
    """A 2-epoch smoke fit must emit the reference's artifact set."""
    from icafusion_tpu.config import DataConfig, load_hyp_config
    from icafusion_tpu.models.zoo import tiny_icafusion_config
    from icafusion_tpu.train.fit import FitConfig, fit

    _make_disk_dataset(tmp_path / "data", n=8)
    data_cfg = DataConfig(nc=2, names=("a", "b"), path=str(tmp_path / "data"),
                          train_rgb="visible/train", val_rgb="visible/train",
                          train_ir="infrared/train", val_ir="infrared/train")
    result = fit(FitConfig(
        model_cfg=tiny_icafusion_config(nc=2), data_cfg=data_cfg,
        hyp=load_hyp_config(None), epochs=2, batch_size=4, imgsz=96,
        project=str(tmp_path / "runs"), name="exp", autoanchor=False,
        workers=0, warmup_min_steps=2, max_targets=16, n_devices=2))

    run_dir = Path(result["run_dir"])
    expected = ["results.csv", "labels.png", "train_batch0.jpg",
                "train_batch1.jpg", "results.png", "PR_curve.png",
                "F1_curve.png", "P_curve.png", "R_curve.png",
                "confusion_matrix.png", "hyp.yaml", "opt.json",
                "weights/last.ckpt", "weights/stripped.ckpt"]
    missing = [f for f in expected if not (run_dir / f).exists()]
    assert not missing, f"missing run-dir artifacts: {missing}"

    rows = list(csv.DictReader(open(run_dir / "results.csv")))
    assert len(rows) == 2
    assert all(float(r["lobj"]) > 0 for r in rows)


@pytest.mark.slow
def test_fit_merge_streams_checkpoints_standard_layout(tmp_path):
    """fit(merge_streams=3) trains on the merged graph but writes checkpoints
    in the standard per-stream layout: loadable by the normal (unmerged)
    model, no merged m{i}_{j} keys, and resume re-merges transparently."""
    from icafusion_tpu.config import DataConfig, load_hyp_config
    from icafusion_tpu.models import build_model
    from icafusion_tpu.models.zoo import tiny_icafusion_config
    from icafusion_tpu.train.fit import FitConfig, fit
    from icafusion_tpu.utils.checkpoint import load_checkpoint

    _make_disk_dataset(tmp_path / "data", n=8)
    data_cfg = DataConfig(nc=2, names=("a", "b"), path=str(tmp_path / "data"),
                          train_rgb="visible/train", val_rgb="visible/train",
                          train_ir="infrared/train", val_ir="infrared/train")
    mc = tiny_icafusion_config(nc=2)
    kw = dict(model_cfg=mc, data_cfg=data_cfg, hyp=load_hyp_config(None),
              batch_size=4, imgsz=96, project=str(tmp_path / "runs"),
              autoanchor=False, workers=0, warmup_min_steps=2,
              max_targets=16, n_devices=2, merge_streams=3)
    result = fit(FitConfig(name="m", epochs=1, **kw))
    run_dir = Path(result["run_dir"])

    ckpt = load_checkpoint(run_dir / "weights/last.ckpt")
    params = ckpt["ema_tree"]["params"]
    assert "m0" in params and "m9" in params and "m0_9" not in params, \
        "merged-graph training must checkpoint the standard layout"

    # the standard model serves the checkpoint directly
    import jax
    import jax.numpy as jnp
    model = build_model(mc)
    v = {"params": ckpt["ema_tree"]["params"],
         "batch_stats": ckpt["ema_tree"]["batch_stats"]}
    x = jnp.zeros((1, 96, 96, 3), jnp.float32)
    pred, _, _ = jax.jit(
        lambda v, a, b: model.apply(v, a, b, train=False, decode=True)
    )(v, x, x)
    assert np.isfinite(np.asarray(pred)).all()

    # resume: re-merges the standard-layout checkpoint and continues
    result2 = fit(FitConfig(name="m_resume", epochs=2,
                            resume=str(run_dir / "weights/last.ckpt"), **kw))
    rows = list(csv.DictReader(open(Path(result2["run_dir"]) / "results.csv")))
    assert len(rows) == 1 and float(rows[0]["lobj"]) > 0


@pytest.mark.slow
def test_fit_reference_results_csv(tmp_path):
    """results_format='reference' writes the reference's epoch + 29-key row
    (train.py:398-411): exact header, real val losses from the eval forward,
    KAIST MR columns populated when kaist_ann is given — and the REFERENCE's
    own plot_results parses the file unmodified (plots.py:457-480)."""
    from icafusion_tpu.config import DataConfig, load_hyp_config
    from icafusion_tpu.models.zoo import tiny_icafusion_config
    from icafusion_tpu.train.fit import (REFERENCE_RESULTS_KEYS, FitConfig,
                                         fit)

    _make_disk_dataset(tmp_path / "data", n=8)
    data_cfg = DataConfig(nc=2, names=("a", "b"), path=str(tmp_path / "data"),
                          train_rgb="visible/train", val_rgb="visible/train",
                          train_ir="infrared/train", val_ir="infrared/train")
    ann = Path(__file__).parent / "fixtures" / "KAIST_annotation.json"
    result = fit(FitConfig(
        model_cfg=tiny_icafusion_config(nc=2), data_cfg=data_cfg,
        hyp=load_hyp_config(None), epochs=2, batch_size=4, imgsz=96,
        project=str(tmp_path / "runs"), name="ref", autoanchor=False,
        workers=0, warmup_min_steps=2, max_targets=16, n_devices=2,
        results_format="reference", kaist_ann=str(ann)))
    run_dir = Path(result["run_dir"])
    csv_path = run_dir / "results.csv"

    lines = csv_path.read_text().strip().splitlines()
    assert lines[0] == ",".join(["epoch"] + REFERENCE_RESULTS_KEYS)
    assert len(lines) == 3  # header + 2 epochs
    rows = list(csv.DictReader(open(csv_path)))
    for r in rows:
        assert len(r) == 30 and None not in r.values()
        # train losses real, rank slot zero (reference ranking loss disabled)
        assert float(r["train/obj_loss"]) > 0
        assert float(r["train/rank_loss"]) == 0.0
        # val losses computed from the eval forward's fmaps, not zeros
        assert float(r["val/obj_loss"]) > 0
        for k in ("x/lr0", "x/lr1", "x/lr2"):
            assert float(r[k]) > 0
        # MR columns populated from the per-epoch KAIST eval
        mr = [float(r[k]) for k in REFERENCE_RESULTS_KEYS[-10:]]
        assert all(np.isfinite(mr))
    # per-epoch MR submission artifacts
    assert (run_dir / "mr_txt" / "result.txt").exists()

    # the REFERENCE's plot_results consumes the csv unmodified
    import sys
    (run_dir / "results.png").unlink()  # ours from fit(); ref must recreate it
    sys.path.insert(0, "/root/reference")
    try:
        from test_torch_parity import _stub_torchvision
        _stub_torchvision()
        import importlib
        ref_plots = importlib.import_module("utils.plots")
        assert str(Path(ref_plots.__file__)).startswith("/root/reference")
        # plot_results swallows per-file parse errors with a printed warning
        # (plots.py:473-474) — a clean run must print none
        import contextlib
        import io
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            ref_plots.plot_results(file=str(csv_path))
        assert "Plotting error" not in buf.getvalue(), buf.getvalue()
        assert (run_dir / "results.png").exists(), \
            "reference plot_results failed to parse our csv"
    finally:
        sys.path.remove("/root/reference")


def test_viable_train_scales_safety_net():
    """The up-front trace-check drops buckets a model cannot trace at, keeps
    the rest, and never drops the base 1.0 bucket. Since the round-4
    adaptive-pool fallback, every real Transfusion bucket is viable (see
    tests/test_adaptive_pool.py::test_multiscale_buckets_all_viable_for_tfb),
    so the net is exercised with a stub model that rejects small inputs —
    it remains the guard for any future shape-constrained module."""
    from icafusion_tpu.train.fit import viable_train_scales

    class Stub:
        def apply(self, variables, rgb, ir, **kw):
            if rgb.shape[1] < 320:
                raise ValueError(f"cannot run at {rgb.shape[1]}")
            return rgb, {}

    msgs = []
    kept = viable_train_scales(Stub(), {}, {}, 320, 320,
                               (0.75, 0.875, 1.0, 1.125, 1.25), msgs.append)
    assert kept == (1.0, 1.125, 1.25)
    assert len(msgs) == 2

    # the base bucket is never dropped even if it cannot trace: that error
    # must propagate from the real run, not be silently skipped
    kept_base = viable_train_scales(Stub(), {}, {}, 256, 256,
                                    (1.0, 1.25), msgs.append)
    assert 1.0 in kept_base
