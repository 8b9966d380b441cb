#!/bin/bash
# Round-4 production soak: ONE run composing every training/serving feature
# (VERDICT r3 ask #3). Mirrors the reference's one-driver-does-all contract
# (train.py:42-490):
#   merge-streams auto x accum auto x multi-scale training,
#   KILLED mid-run (SIGKILL) -> --resume -> strip,
#   stripped ckpt served via ServingEngine(merge_streams=auto, quantize=int8),
#   and scored by cli/val --rect --int8 --merge auto --kaist-ann.
# Artifacts land in docs/r04_soak/. Run with the TPU tunnel up (~25 min).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:${PYTHONPATH:-}
WORK=${1:-runs/soak}
LOG=${LOG:-docs/r04_soak}   # e.g. LOG=docs/r05_soak for a round-5 re-run
mkdir -p "$LOG"

run() { # name cmd...
  local name=$1; shift
  echo "=== $name: $*" | tee -a "$LOG/summary.txt"
  "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  tail -4 "$LOG/$name.log" | tee -a "$LOG/summary.txt"
  echo "--- rc=$rc" | tee -a "$LOG/summary.txt"
}

rm -f "$LOG/summary.txt"
run prep python tools/soak_prep.py --workdir "$WORK"

TRAIN_ARGS=(--cfg zoo:tfb:n --data "$WORK/data.yaml" --img-size 320 \
  --batch-size 8 --epochs 10 --merge-streams auto --accum auto --multi-scale \
  --project "$WORK/runs" --workers 4 --warmup-min 20 --noautoanchor \
  --results-format reference --kaist-ann "$WORK/kaist_ann.json")

# phase 1: train, then SIGKILL mid-run (no graceful shutdown) — last.ckpt
# must survive. Deterministic kill: poll results.csv until epoch 3 has been
# written (header + 4 rows), then SIGKILL the training process.
echo "=== train_phase1 (SIGKILL after epoch 3)" | tee -a "$LOG/summary.txt"
python -m icafusion_tpu.cli.train "${TRAIN_ARGS[@]}" --name soak \
  >"$LOG/train_phase1.log" 2>&1 &
PID=$!
for i in $(seq 1 600); do
  sleep 5
  R=$(ls -t "$WORK"/runs/soak*/results.csv 2>/dev/null | head -1)
  if [ -n "$R" ] && [ "$(wc -l < "$R")" -ge 5 ]; then break; fi
  kill -0 $PID 2>/dev/null || break
done
kill -KILL $PID 2>/dev/null
wait $PID
echo "--- phase1 rc=$? (137 = SIGKILL, expected)" | tee -a "$LOG/summary.txt"
tail -3 "$LOG/train_phase1.log" | tee -a "$LOG/summary.txt"
LAST=$(ls -t "$WORK"/runs/soak*/weights/last.ckpt | head -1)
echo "resuming from $LAST" | tee -a "$LOG/summary.txt"

run train_phase2 python -m icafusion_tpu.cli.train "${TRAIN_ARGS[@]}" \
  --name soak_resume --resume "$LAST"
RUN=$(ls -td "$WORK"/runs/soak_resume* | head -1)
cp "$RUN/results.csv" "$LOG/results.csv" 2>/dev/null
cp "$RUN/results.png" "$LOG/results.png" 2>/dev/null

run serve python tools/soak_serve.py --ckpt "$RUN/weights/stripped.ckpt" \
  --data-root "$WORK/data" --imgsz 320

run score python -m icafusion_tpu.cli.val --weights "$RUN/weights/stripped.ckpt" \
  --cfg zoo:tfb:n --data "$WORK/data.yaml" --img-size 320 --batch-size 8 \
  --rect --int8 --merge auto --save-txt --kaist-ann "$WORK/kaist_ann.json" \
  --save-dir "$WORK/val"
cp "$WORK/val/metrics.json" "$LOG/val_metrics.json" 2>/dev/null
echo "done -> $LOG/summary.txt"
