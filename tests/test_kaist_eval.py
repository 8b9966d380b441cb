"""KAIST miss-rate evaluator parity: our port must reproduce the reference
evaluation_script's numbers on the shipped golden fixtures (MBNet and
MSDS-RCNN result files).

Golden values were produced by running the reference evaluator in-process
(evaluation_script.py:546-646, plot=True printout) on these exact fixtures.
"""

from pathlib import Path

import numpy as np
import pytest

from icafusion_tpu.eval.kaist import evaluate_kaist, load_detections, load_kaist_gt

FIX = Path(__file__).parent / "fixtures"

GOLDEN = dict(MR_all=8.13, MR_day=8.28, MR_night=7.86, MR_near=0.03,
              MR_medium=16.09, MR_far=55.99, MR_none=27.75, MR_partial=35.43,
              MR_heavy=59.14, recall_all=98.42)

GOLDEN_MSDS = dict(MR_all=11.34, MR_day=10.54, MR_night=12.94, MR_near=1.29,
                   MR_medium=16.28, MR_far=63.73, MR_none=30.00,
                   MR_partial=38.71, MR_heavy=63.37, recall_all=94.30)


@pytest.fixture(scope="module")
def result():
    return evaluate_kaist(str(FIX / "KAIST_annotation.json"),
                          str(FIX / "MBNet_result.txt"))


def test_mr_matches_reference_golden_msds():
    got = evaluate_kaist(str(FIX / "KAIST_annotation.json"),
                         str(FIX / "MSDS-RCNN_result.txt")).as_dict()
    for k, v in GOLDEN_MSDS.items():
        assert round(got[k] * 100, 2) == pytest.approx(v, abs=0.011), (
            f"{k}: got {got[k] * 100:.4f}, golden {v}")


def test_loaders():
    img_ids, gts = load_kaist_gt(str(FIX / "KAIST_annotation.json"))
    assert len(img_ids) == 2252
    dts = load_detections(str(FIX / "MBNet_result.txt"))
    assert len(dts) > 1000


def test_mr_matches_reference_golden(result):
    got = result.as_dict()
    for k, v in GOLDEN.items():
        assert round(got[k] * 100, 2) == pytest.approx(v, abs=0.011), (
            f"{k}: got {got[k]*100:.4f}, golden {v}")
