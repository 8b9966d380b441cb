"""REAL multi-process SPMD coverage: a genuine 2-process JAX cluster
(jax.distributed.initialize over a localhost coordinator, virtual CPU
devices per process, Gloo cross-process collectives) running the full fit()
driver, compared against the 1-process same-total-devices run on the same
data/seed.

This replaces the round-4 monkeypatch-only test as the §2.8 multi-process
evidence (reference DDP: train.py:567-573, DistributedSampler datasets.py:119,
rank-0 gates). The strict instrument is the per-step loss probe; the fit()
comparison allows the measured compounding of collective-reduction-order
noise. tools/multihost_train.py is the underlying harness; the committed
MULTIHOST_r05.json artifact is produced by the same tool.
"""

import json
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_two_process_cluster_matches_single_process(tmp_path):
    out_json = tmp_path / "multihost.json"
    r = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "multihost_train.py"),
         "--epochs", "2", "--n", "48", "--workdir", str(tmp_path / "work"),
         "--write-json", str(out_json)],
        capture_output=True, text=True, timeout=2400)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    payload = json.loads(out_json.read_text())
    assert payload["verdict"] == "MATCH"
    # strict: step 1 agrees before any parameter update can compound float
    # noise; the tail steps stay inside the documented compounding budget
    assert payload["per_step_probe"]["step1_abs_delta"] <= \
        payload["per_step_probe"]["step1_tol"]
    assert payload["per_step_probe"]["max_abs_delta"] <= \
        payload["per_step_probe"]["tol"]
    # the fit()-level epochs agree within the documented compounding budget
    assert payload["max_abs_loss_delta"] <= payload["tol"]
    assert len(payload["multiprocess"]) == 2
