"""Eval-harness tests: AP math against hand-computed cases, matching semantics,
and the full evaluator chain (decode+NMS+rescale+match+AP) via a stub model that
emits known predictions."""

import numpy as np
import pytest

import jax.numpy as jnp

from icafusion_tpu.eval.evaluator import Evaluator, IOUV, match_predictions
from icafusion_tpu.eval.metrics import ap_per_class, compute_ap, fitness, summarize


def test_compute_ap_perfect():
    # single TP at conf 1.0, one GT: AP == 1
    ap, _, _ = compute_ap(np.array([1.0]), np.array([1.0]))
    assert ap == pytest.approx(1.0, abs=0.02)  # 101-pt interp quantization


def test_ap_per_class_known_case():
    # 2 classes; class 0: 1 GT, 1 correct pred; class 1: 1 GT, 1 wrong pred
    tp = np.array([[True] * 10, [False] * 10])
    conf = np.array([0.9, 0.8])
    pred_cls = np.array([0.0, 1.0])
    target_cls = np.array([0.0, 1.0])
    _, _, _, p, r, ap, f1, classes = ap_per_class(tp, conf, pred_cls, target_cls)
    assert ap[0, 0] == pytest.approx(1.0, abs=0.02)
    assert ap[1, 0] == 0.0
    assert list(classes) == [0, 1]


def test_fitness_is_map50():
    row = np.array([1, 2, 3, 4, 0.5, 0.6, 0.77, 0.4])
    assert fitness(row) == pytest.approx(0.77)


def test_match_predictions_greedy():
    # two preds on one target: only the higher-conf (earlier) one is correct
    tbox = np.array([[10.0, 10, 50, 50]])
    tcls = np.array([0.0])
    pred = np.array([[10, 10, 50, 50, 0.9, 0],
                     [12, 12, 52, 52, 0.8, 0]], np.float32)
    correct = match_predictions(pred, tbox, tcls)
    assert correct[0, 0] and not correct[1, 0]
    # class mismatch -> no match
    pred2 = pred.copy()
    pred2[:, 5] = 1
    assert not match_predictions(pred2, tbox, tcls).any()


class StubModel:
    """Emits fixed decoded predictions (xywh+obj+cls) regardless of input."""

    def __init__(self, pred):
        self.pred = jnp.asarray(pred)

    def apply(self, variables, rgb, ir, train=False, decode=True):
        b = rgb.shape[0]
        p = jnp.broadcast_to(self.pred, (b,) + self.pred.shape)
        return p, None, None


def _val_batch(img_size, n, h0, w0, labels):
    rgb = np.zeros((n, img_size, img_size, 3), np.uint8)
    r = min(img_size / h0, img_size / w0)
    pad = ((img_size - w0 * r) / 2, (img_size - h0 * r) / 2)
    return {"rgb": rgb, "ir": rgb.copy(),
            "labels": [labels.copy() for _ in range(n)],
            "shapes": [((h0, w0), ((r, r), pad))] * n,
            "count": n, "paths": [f"im{i}.jpg" for i in range(n)]}


def test_evaluator_perfect_predictions(tmp_path):
    """Stub predictions exactly on the (letterbox-transformed) GT -> mAP == 1."""
    img_size, h0, w0 = 320, 240, 320
    # one GT box, normalized xywh in ORIGINAL image coords
    labels = np.array([[0, 0.5, 0.5, 0.25, 0.25]], np.float32)
    r = min(img_size / h0, img_size / w0)  # 1.0
    pad = ((img_size - w0 * r) / 2, (img_size - h0 * r) / 2)  # (0, 40)
    # the model predicts in letterboxed space
    cx, cy = 0.5 * w0 * r + pad[0], 0.5 * h0 * r + pad[1]
    bw, bh = 0.25 * w0 * r, 0.25 * h0 * r
    pred = np.zeros((8, 8), np.float32)   # (N=8 candidates, 5+nc=3)
    # secondary class scores below conf/obj so multi-label keeps only class 0
    pred[0] = [cx, cy, bw, bh, 0.95, 0.99, 0.0005, 0.0005]
    ev = Evaluator(model=StubModel(pred), nc=3)
    out = ev.run(None, [_val_batch(img_size, 2, h0, w0, labels)], img_size,
                 mr_txt_dir=str(tmp_path / "mr"))
    assert out["map50"] == pytest.approx(1.0, abs=0.02)
    assert out["map"] == pytest.approx(1.0, abs=0.02)
    assert out["seen"] == 2
    # MR txt written in "(idx),x,y,w,h,conf" format
    txt = (tmp_path / "mr" / "result.txt").read_text().strip().splitlines()
    assert len(txt) == 2
    assert len(txt[0].split(",")) == 6


def test_evaluator_offset_predictions_lower_map():
    img_size, h0, w0 = 320, 320, 320
    labels = np.array([[0, 0.5, 0.5, 0.25, 0.25]], np.float32)
    pred = np.zeros((8, 8), np.float32)
    # ~55% IoU offset box: counts at IoU 0.5 but not at 0.75+
    pred[0] = [160 + 12, 160, 80, 80, 0.9, 0.99, 0.005, 0.005]
    ev = Evaluator(model=StubModel(pred), nc=3)
    out = ev.run(None, [_val_batch(img_size, 1, h0, w0, labels)], img_size)
    assert out["map50"] == pytest.approx(1.0, abs=0.02)
    assert out["map"] < 0.6


def test_evaluator_no_predictions():
    img_size = 320
    labels = np.array([[0, 0.5, 0.5, 0.25, 0.25]], np.float32)
    pred = np.zeros((8, 8), np.float32)  # all conf 0
    ev = Evaluator(model=StubModel(pred), nc=3)
    out = ev.run(None, [_val_batch(img_size, 1, 320, 320, labels)], img_size)
    assert out["map50"] == 0.0

def test_evaluator_confluence_swap_in():
    """Evaluator(confluence=True): the reference's commented NMS alternative
    (test.py:140) — decoded predictions come back to the host and go through
    confluence_process; duplicates are clustered away, the metrics chain is
    unchanged."""
    from icafusion_tpu.ops.confluence import confluence_process

    img_size = 320
    labels = np.array([[0, 0.5, 0.5, 0.25, 0.25]], np.float32)
    pred = np.zeros((8, 8), np.float32)
    # exact box + a near-duplicate (cluster) + a far box (second GT-less det)
    pred[0] = [160, 160, 80, 80, 0.95, 0.99, 0.005, 0.005]
    pred[1] = [162, 161, 80, 80, 0.90, 0.98, 0.005, 0.005]
    pred[2] = [40, 40, 30, 30, 0.80, 0.97, 0.005, 0.005]
    ev = Evaluator(model=StubModel(pred), nc=3, conf_thres=0.1,
                   confluence=True)
    out = ev.run(None, [_val_batch(img_size, 2, img_size, img_size, labels)],
                 img_size)
    # the exact box survives clustering and matches the GT
    assert out["map50"] == pytest.approx(1.0, abs=0.02)
    assert out["seen"] == 2
    # the evaluator's det set equals a direct confluence_process on the raw
    # decoded predictions (same conf gate, same proximity threshold)
    direct = confluence_process(pred[None], conf_thres=0.1, p_thres=0.6)[0]
    assert len(direct) == 2  # duplicate removed, far box kept
    stats_conf = np.sort(direct[:, 4])
    assert np.allclose(stats_conf, [0.8 * 0.97, 0.95 * 0.99], atol=1e-6)


def test_evaluator_reports_timing():
    """t_total_ms: end-to-end ms/img with the first (compile) batch excluded."""
    img_size = 320
    labels = np.array([[0, 0.5, 0.5, 0.25, 0.25]], np.float32)
    pred = np.zeros((8, 8), np.float32)
    pred[0] = [160, 160, 80, 80, 0.9, 0.99, 0.005, 0.005]
    ev = Evaluator(model=StubModel(pred), nc=3)
    batches = [_val_batch(img_size, 2, img_size, img_size, labels)
               for _ in range(3)]
    out = ev.run(None, batches, img_size)
    assert out["t_total_ms"] > 0.0
    # single batch -> all time is compile time, excluded
    out1 = ev.run(None, batches[:1], img_size)
    assert out1["t_total_ms"] == 0.0


def test_plot_study_txt_and_evolution(tmp_path):
    """plots for --task study output and the evolve log (plots.py:298-400)."""
    from icafusion_tpu.utils.plots import plot_evolution, plot_study_txt
    rows = np.array([[0.9, 0.8, 0.85, 0.55, 0, 0, 0, 4.0, 0.0, 4.0],
                     [0.92, 0.82, 0.88, 0.60, 0, 0, 0, 9.0, 0.0, 9.0]])
    np.savetxt(tmp_path / "study_FLIR_best.txt", rows, fmt="%10.4g")
    png = plot_study_txt(tmp_path)
    assert png and (tmp_path / "study.png").exists()

    (tmp_path / "evolve.csv").write_text(
        "fitness,lr0,momentum\n0.5,0.01,0.9\n0.7,0.02,0.95\n0.6,0.015,0.93\n")
    png2 = plot_evolution(tmp_path / "evolve.csv")
    assert png2 and (tmp_path / "evolve.png").exists()
