#!/bin/bash
# Round-3 stream-merge measurement runbook (run when the TPU tunnel is up).
# Serializes all jobs (one chip, one CPU — see CLAUDE.md). ~40 min total.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:${PYTHONPATH:-}
LOG=${1:-/tmp/r3_merge_bench}
mkdir -p "$LOG"

run() { # name cmd...
  local name=$1; shift
  echo "=== $name: $*" | tee -a "$LOG/summary.txt"
  timeout 1800 "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  tail -3 "$LOG/$name.log" | tee -a "$LOG/summary.txt"
  echo "--- rc=$rc" | tee -a "$LOG/summary.txt"
}

run probe     python -c "import jax; print(jax.devices())"
run primitive python tools/stream_merge_probe.py --batch 32 --iters 30
run serve_bf16        python bench.py --bf16 --merge 0
run serve_bf16_merge  python bench.py --bf16 --merge 3
run serve_int8        python bench.py --merge 0
run serve_int8_merge  python bench.py --merge 3
run train             python bench.py --train --merge 0
run train_merge       python bench.py --train --merge 3
# int8 accuracy on the TPU backend with the round-3 product default
# (Detect-feeder convs fp) — refreshes ACCURACY.md's TPU int8 row
run parity_int8_tpu   python tools/trained_parity.py --dtypes fp32,int8 --no-merge
# refresh INT8_ACCURACY.json (tiny trained detector) under the same default
run int8_acc_refresh  python tools/int8_accuracy.py --skip-train
echo "done -> $LOG/summary.txt"
