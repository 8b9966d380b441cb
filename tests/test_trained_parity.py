"""Trained-detector cross-framework parity (the strong accuracy instrument).

A checkpoint TRAINED in this framework (runs/convergence_n320, yolov5n-
Transfusion @320, mAP@50 0.974) flows through reverse_convert into the actual
reference torch stack; both frameworks' full eval pipelines then score against
the REAL ground-truth labels of the committed val split. Small-scale version
of tools/trained_parity.py (which writes TRAINED_PARITY.json / ACCURACY.md's
headline). Eval settings: /root/reference/test.py:374-378; acceptance gate:
README.md:56-59 (within 0.3 mAP@50 pts).
"""

import sys
from pathlib import Path

import pytest

pytest.importorskip("torch")

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT / "tools"))

CKPT = ROOT / "artifacts/trained_n320/stripped.ckpt"
DATA = ROOT / "artifacts/trained_n320/data"


@pytest.fixture(scope="module")
def trained_results(reference_dir):
    if not CKPT.exists():
        pytest.skip("trained checkpoint not in tree")
    from trained_parity import run
    return run(ckpt=str(CKPT), data_root=str(DATA), n=16, batch=4,
               dtypes=("fp32",), merge_sweep=False, stream_merge="auto",
               verbose=False)


@pytest.mark.slow
def test_reverse_bridge_and_map_delta(trained_results):
    r = trained_results
    # the torch side must actually detect (the bridge carried a working model)
    assert r["torch"]["map50"] > 0.9, f"torch side degenerate: {r['torch']}"
    e = r["ours"]["fp32"]
    assert abs(e["map50_delta_vs_torch"]) <= 0.003, (
        f"trained-detector mAP@50 delta "
        f"{e['map50_delta_vs_torch'] * 100:+.3f} pts exceeds the 0.3 gate")


@pytest.mark.slow
def test_trained_box_agreement(trained_results):
    a = trained_results["ours"]["fp32"]["agreement_conf0.01_vs_torch"]
    assert a["match_rate"] > 0.97, f"box match rate {a['match_rate']:.4f}"
    assert a["mean_iou"] > 0.98, f"mean matched IoU {a['mean_iou']:.4f}"


def test_confusion_matrix_matches_reference(reference_dir):
    """The rewritten election/scatter-max ConfusionMatrix.process_batch is
    bit-identical to the reference's sort/unique formulation
    (utils/metrics.py:113-160), including exact-IoU-tie and no-match-quirk
    paths (fuzzed, with injected duplicate boxes forcing ties)."""
    import numpy as np
    import torch

    from ref_compat import stub_torch_deps
    stub_torch_deps()
    import utils.general  # noqa: F401  (breaks the reference's circular import)
    from utils.metrics import ConfusionMatrix as RefCM  # reference

    from icafusion_tpu.eval.metrics import ConfusionMatrix

    rng = np.random.default_rng(0)
    for trial in range(120):
        nc = int(rng.integers(1, 6))
        n, m = int(rng.integers(0, 20)), int(rng.integers(0, 12))
        det = np.zeros((n, 6), np.float32)
        if n:
            xy = rng.uniform(0, 80, (n, 2))
            wh = rng.uniform(2, 40, (n, 2))
            det[:, :2], det[:, 2:4] = xy, xy + wh
            det[:, 4] = rng.uniform(0, 1, n)
            det[:, 5] = rng.integers(0, nc, n)
        lab = np.zeros((m, 5), np.float32)
        if m:
            xy = rng.uniform(0, 80, (m, 2))
            wh = rng.uniform(2, 40, (m, 2))
            lab[:, 0] = rng.integers(0, nc, m)
            lab[:, 1:3], lab[:, 3:5] = xy, xy + wh
        if n > 2 and m > 1 and trial % 3 == 0:   # exact-tie IoUs
            det[1, :4] = det[0, :4]
            lab[1, 1:5] = det[0, :4]
            lab[0, 1:5] = det[0, :4]
            det[0, 4] = det[1, 4] = 0.9
        ours = ConfusionMatrix(nc)
        ours.process_batch(det, lab)
        ref = RefCM(nc)
        ref.process_batch(torch.from_numpy(det), torch.from_numpy(lab))
        assert np.array_equal(ours.matrix, ref.matrix.astype(np.int64)), trial


@pytest.mark.slow
def test_rect_val_product_path(reference_dir):
    """cli/val's --rect path (Evaluator over rect_val_batches) evaluates the
    trained checkpoint end-to-end: rect pad-0.5 canvases, per-shape jit."""
    if not CKPT.exists():
        pytest.skip("trained checkpoint not in tree")
    import jax.numpy as jnp

    from icafusion_tpu.config import load_hyp_config, load_model_config
    from icafusion_tpu.data.datasets import PairedDetectionDataset
    from icafusion_tpu.data.loader import PairedLoader
    from icafusion_tpu.eval.evaluator import Evaluator
    from icafusion_tpu.models import build_model
    from icafusion_tpu.utils.checkpoint import load_inference_variables

    cfg = load_model_config(
        str(reference_dir / "models/transformer/yolov5n_Transfusion_FLIR.yaml"))
    model = build_model(cfg, dtype=jnp.float32)
    variables = load_inference_variables(str(CKPT))
    ds = PairedDetectionDataset(str(DATA / "visible/val"),
                                str(DATA / "infrared/val"), img_size=320,
                                hyp=load_hyp_config(), augment=False, nc=3)
    ds.files_rgb = ds.files_rgb[:8]
    ds.files_ir = ds.files_ir[:8]
    ds.labels = ds.labels[:8]
    loader = PairedLoader(ds, batch_size=4, shuffle=False)
    ev = Evaluator(model=model, nc=3)
    out = ev.run(variables, loader.rect_val_batches(), 320)
    assert out["seen"] == 8
    assert out["map50"] > 0.9, f"rect-val mAP50 {out['map50']:.4f}"


@pytest.mark.slow
def test_stream_merged_eval_identical(trained_results):
    """The stream-merged graph reproduces the unmerged fp32 eval on real data
    end-to-end: same mAP@50 and per-box agreement (the lane-recovery
    transform is a pure execution-layout change)."""
    merged = [v for k, v in trained_results["ours"].items()
              if k.startswith("fp32+merge")]
    assert merged, "stream-merge column missing from the parity run"
    e = merged[0]
    assert abs(e["map50_delta_vs_fp_ours"]) < 1e-4, e
    a = e["agreement_conf0.01_vs_fp_ours"]
    assert a["match_rate"] > 0.999 and a["mean_iou"] > 0.999, a


# ---------------------------------------------------------------------------
# Flagship-geometry instrument: yolov5s-Transfusion trained @ 640 (round 4).
# The committed TRAINED_PARITY_640.json is scored on the 141-pair HELD-OUT
# extval split (artifacts/trained_s640/extval) at the real 400/256/100 fusion
# sequence lengths and s-scale channel widths. Gate: README.md:56-59
# (within 0.3 mAP@50 pts of the reference torch stack).
# ---------------------------------------------------------------------------

CKPT_640 = ROOT / "artifacts/trained_s640/stripped.ckpt"
ARTIFACT_640 = ROOT / "TRAINED_PARITY_640.json"


def test_trained_parity_640_artifact_gate():
    """Every scored numerics row of the flagship-geometry parity artifact is
    inside the 0.3-pt acceptance gate, on a non-toy instrument (>=100 held-out
    pairs, >=200 GT boxes). Regenerate with the command in
    artifacts/trained_s640/README.md."""
    import json

    if not ARTIFACT_640.exists():
        pytest.skip("TRAINED_PARITY_640.json not in tree")
    r = json.loads(ARTIFACT_640.read_text())
    assert r["imgsz"] == 640
    assert r["n_images"] >= 100 and r["n_gt"] >= 200, (
        f"instrument too small: {r['n_images']} imgs / {r['n_gt']} boxes")
    assert r["torch"]["map50"] > 0.9, f"torch side degenerate: {r['torch']}"
    for tag in ("fp32", "bf16", "int8"):
        e = r["ours"][tag]
        assert abs(e["map50_delta_vs_torch"]) <= 0.003, (
            f"{tag}: delta {e['map50_delta_vs_torch'] * 100:+.3f} pts "
            f"exceeds the 0.3 gate")
    # rect pad-0.5 protocol scored on both frameworks
    rect = r["ours"]["fp32+rect"]
    assert abs(rect["map50_delta_vs_torch"]) <= 0.003, rect
    # stream merge is a pure execution-layout change at fp32
    merged = [v for k, v in r["ours"].items() if k.startswith("fp32+merge")]
    assert merged and abs(merged[0]["map50_delta_vs_fp_ours"]) <= 1e-3, merged
    # per-box agreement at deploy confidence
    a = r["ours"]["fp32"]["agreement_conf0.01_vs_torch"]
    assert a["match_rate"] > 0.97 and a["mean_iou"] > 0.98, a


@pytest.mark.slow
def test_trained_parity_640_live_smoke(reference_dir):
    """Live cross-framework run of the flagship-geometry instrument on a
    small slice: the s640 checkpoint through reverse_convert into the torch
    stack and through our fp32 pipeline at 640, both scoring the held-out
    extval labels."""
    if not CKPT_640.exists():
        pytest.skip("s640 checkpoint not in tree")
    from trained_parity import run
    r = run(ckpt=str(CKPT_640),
            cfg_path=str(reference_dir /
                         "models/transformer/yolov5s_Transfusion_FLIR.yaml"),
            data_root=str(ROOT / "artifacts/trained_s640/extval"),
            imgsz=640, n=8, batch=4, dtypes=("fp32",), merge_sweep=False,
            stream_merge=0, verbose=False)
    assert r["torch"]["map50"] > 0.9, f"torch side degenerate: {r['torch']}"
    e = r["ours"]["fp32"]
    assert abs(e["map50_delta_vs_torch"]) <= 0.003, (
        f"640 live: delta {e['map50_delta_vs_torch'] * 100:+.3f} pts")


# ---------------------------------------------------------------------------
# FLAGSHIP instrument: yolov5l-Transfusion trained @ 640 (round 5). The
# committed TRAINED_PARITY_L640.json is scored on the same 141-pair held-out
# extval split, at the exact graph the bench headline and the reference's
# published 82.8 are framed on (yolov5l, d_model-1024 fusion — README.md:56).
# ---------------------------------------------------------------------------

ARTIFACT_L640 = ROOT / "TRAINED_PARITY_L640.json"


def test_trained_parity_l640_artifact_gate():
    """Every scored numerics row of the FLAGSHIP (l-scale @640) parity
    artifact is inside the 0.3-pt acceptance gate on the 141-pair held-out
    instrument. Regenerate with the command in
    artifacts/trained_l640/README.md."""
    import json

    if not ARTIFACT_L640.exists():
        pytest.skip("TRAINED_PARITY_L640.json not in tree")
    r = json.loads(ARTIFACT_L640.read_text())
    assert r["imgsz"] == 640 and "yolov5l" in r["cfg"]
    assert r["n_images"] >= 100 and r["n_gt"] >= 200, (
        f"instrument too small: {r['n_images']} imgs / {r['n_gt']} boxes")
    assert r["torch"]["map50"] > 0.9, f"torch side degenerate: {r['torch']}"
    for tag in ("fp32", "bf16", "int8"):
        e = r["ours"][tag]
        assert abs(e["map50_delta_vs_torch"]) <= 0.003, (
            f"{tag}: delta {e['map50_delta_vs_torch'] * 100:+.3f} pts "
            f"exceeds the 0.3 gate")
    rect = r["ours"]["fp32+rect"]
    assert abs(rect["map50_delta_vs_torch"]) <= 0.003, rect
    merged = [v for k, v in r["ours"].items() if k.startswith("fp32+merge")]
    assert merged and abs(merged[0]["map50_delta_vs_fp_ours"]) <= 1e-3, merged
    a = r["ours"]["fp32"]["agreement_conf0.01_vs_torch"]
    assert a["match_rate"] > 0.97 and a["mean_iou"] > 0.98, a
