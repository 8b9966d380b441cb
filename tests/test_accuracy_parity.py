"""End-to-end accuracy parity vs the reference: identical weights through BOTH
frameworks' full eval pipelines (letterbox -> forward -> decode -> NMS ->
scale_coords -> mAP) on a shared synthetic paired-image set; the mAP@50 delta
must stay inside the FLIR acceptance gate (within 0.3 points —
/root/reference/README.md:56-59, test.py:374-378 eval settings).

Small-scale version of tools/accuracy_parity.py (which writes ACCURACY.md).
"""

import sys
from pathlib import Path

import pytest

pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))


@pytest.fixture(scope="module")
def parity_results(reference_dir):
    from accuracy_parity import run
    return run(n=16, imgsz=320, batch=4, top_ks=(8192,),
               rect_sweep=False, merge_sweep=False, verbose=False)


@pytest.mark.slow
def test_map50_delta_within_gate(parity_results):
    r = parity_results
    # the GT-from-detections protocol puts the torch side near-perfect; any
    # end-to-end divergence in ours shows up as a negative delta in mAP points
    assert r["torch_square"]["map50"] > 0.9, \
        f"torch self-score degenerate: {r['torch_square']}"
    e = r["ours"]["top_k=8192"]
    assert abs(e["map50_delta"]) <= 0.003, \
        f"mAP@50 delta {e['map50_delta'] * 100:+.3f} pts exceeds the 0.3 gate"


@pytest.mark.slow
def test_box_level_agreement(parity_results):
    e = parity_results["ours"]["top_k=8192"]
    a = e["agreement_conf0.01"]
    assert a["match_rate"] > 0.97, f"box match rate {a['match_rate']:.4f}"
    assert a["mean_iou"] > 0.98, f"mean matched IoU {a['mean_iou']:.4f}"
    assert a["mean_dconf"] < 1e-3, f"mean conf delta {a['mean_dconf']:.2e}"


@pytest.mark.slow
def test_scorer_parity(parity_results):
    # our ap_per_class vs the reference's on identical detections
    assert abs(parity_results["scorer_delta_map50"]) < 1e-6, \
        f"metric instrument diverges: {parity_results['scorer_delta_map50']}"
