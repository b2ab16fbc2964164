#!/bin/bash
# Post-fine-tune evidence sequence (round-3 continuation session).
# Waits for the watchdog-managed training to end (complete OR stopped),
# then runs, strictly sequentially (ONE TPU process at a time):
#   1. checkpoint snapshot into checkpoints/
#   2. full 200-frame reference-protocol eval (run.py --type evaluate)
#   3. scatter microbench (cellpack backward diagnosis)
#   4. hashgrid layout A/B with the narrow-split VJP
#   5. CPU test suite
# Logs under /tmp/post_r3ft/; touches /tmp/post_r3ft/done at the end.
set -u
OUT=/tmp/post_r3ft
mkdir -p "$OUT"
DATA=/root/reference/data/nerf_synthetic

# wait until the training process group is gone (covers both natural
# completion and a cooperative /tmp/stop_training shutdown).
# An EMPTY/MISSING pgid file means "training not confirmed down" (the
# watchdog may not have recorded it yet) — never break on that alone, or
# TPU eval could start beside a live trainer (the two-process futex wedge).
PGIDFILE=/tmp/train_r1c.pgid
while true; do
  if [ -f /tmp/train_done ] || [ -f /tmp/stop_training ]; then
    sleep 10   # let the watchdog loop notice and exit too
    break
  fi
  PG=$(cat "$PGIDFILE" 2>/dev/null)
  if [ -n "$PG" ] && ! kill -0 "$PG" 2>/dev/null; then
    # recorded group exists and is down; double-check it stays down
    sleep 5
    if ! kill -0 "$PG" 2>/dev/null; then
      break
    fi
  fi
  sleep 20
done
echo "$(date) training down; starting post sequence" > "$OUT/progress.log"

bash scripts/snapshot_ckpt.sh >> "$OUT/progress.log" 2>&1

# 25-frame fine-tune eval (every 8th test frame — comparable to round-1's
# 25-frame protocol; the full-200 run goes last, time permitting)
echo "$(date) eval25 start" >> "$OUT/progress.log"
timeout 1200 python -u run.py --type evaluate --cfg_file configs/nerf/lego.yaml \
  train_dataset.data_root $DATA test_dataset.data_root $DATA \
  test_dataset.cams "[0,-1,8]" > "$OUT/eval25.log" 2>&1
echo "$(date) eval25 done rc=$?" >> "$OUT/progress.log"
cp workspace/result/nerf/lego/nerf/metrics/evaluation_results.json \
   "$OUT/eval25_results.json" 2>/dev/null || true

timeout 1500 python -u scripts/scatter_microbench.py > "$OUT/scatter.log" 2>&1
echo "$(date) scatter done rc=$?" >> "$OUT/progress.log"

timeout 1800 python -u scripts/hashgrid_layout_bench.py > "$OUT/layout.log" 2>&1
echo "$(date) layout done rc=$?" >> "$OUT/progress.log"

# refresh the ESS/ERT ablation on the fine-tuned checkpoint (full res,
# compile-warm per config inside the harness)
timeout 1800 python -u test_ess_ert.py --cfg_file configs/nerf/lego.yaml \
  train_dataset.data_root $DATA test_dataset.data_root $DATA \
  n_frames 2 H 800 W 800 > "$OUT/ess_ert.log" 2>&1
echo "$(date) ess_ert done rc=$?" >> "$OUT/progress.log"

PALLAS_AXON_POOL_IPS= timeout 1800 python -m pytest tests/ -q \
  > "$OUT/pytest.log" 2>&1
echo "$(date) pytest done rc=$?" >> "$OUT/progress.log"

echo "$(date) eval200 start" >> "$OUT/progress.log"
timeout 2700 python -u run.py --type evaluate --cfg_file configs/nerf/lego.yaml \
  train_dataset.data_root $DATA test_dataset.data_root $DATA \
  > "$OUT/eval_full.log" 2>&1
echo "$(date) eval200 done rc=$?" >> "$OUT/progress.log"
touch "$OUT/done"
