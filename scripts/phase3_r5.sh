#!/bin/bash
# Round-5 phase-3: everything after the 8192-ray quality continuation.
# Waits for its watchdog to come down, then strictly sequentially (ONE
# TPU process at a time):
#   0. CPU test suite (TPU idle; validates the round-5 kilonerf
#      multi-round-dispatch + distill-capacity source changes)
#   1. select/promote the better checkpoint (val probe, floor-guarded)
#   2. full 200-frame reference-protocol eval of the canonical checkpoint
#   3. snapshot canonical -> checkpoints/
#   4. KiloNeRF re-distill (capacity fix, 4000 steps) + 20-frame eval
#   5. bf16_16384 batch-probe point (the deadline-killed table entry)
# Logs under /tmp/post_r5; touches /tmp/post_r5/phase3_done at the end.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/post_r5
mkdir -p "$OUT"
DATA=/root/reference/data/nerf_synthetic

WPIDFILE=/tmp/watchdog_r5.pid
while true; do
  if [ -f /tmp/train_done ] || [ -f /tmp/stop_training ]; then
    sleep 10; break
  fi
  WP=$(cat "$WPIDFILE" 2>/dev/null)
  if [ -n "$WP" ] && ! kill -0 "$WP" 2>/dev/null; then
    PG=$(cat /tmp/train_r1c.pgid 2>/dev/null)
    [ -n "$PG" ] && kill -0 "$PG" 2>/dev/null && { sleep 20; continue; }
    break
  fi
  sleep 20
done
echo "$(date) continuation down; phase3 start" >> "$OUT/progress.log"

# 0. CPU suite — the kilonerf source changes must be green before the
# TPU evidence chain runs on them
PALLAS_AXON_POOL_IPS= timeout 900 python -m pytest tests/ -x -q \
  > "$OUT/pytest_phase3.log" 2>&1
RC=$?
echo "$(date) pytest rc=$RC ($(tail -1 "$OUT/pytest_phase3.log"))" >> "$OUT/progress.log"

# 1. select/promote
timeout 2400 python -u scripts/select_ckpt_r5.py > "$OUT/select.log" 2>&1
echo "$(date) select rc=$?" >> "$OUT/progress.log"

# 2. full 200-frame eval of canonical
timeout 3600 python -u run.py --type evaluate --cfg_file configs/nerf/lego.yaml \
  train_dataset.data_root $DATA test_dataset.data_root $DATA \
  write_video False render_path False > "$OUT/eval200.log" 2>&1
echo "$(date) eval200 rc=$?" >> "$OUT/progress.log"
cp workspace/result/nerf/lego/nerf/metrics/evaluation_results.json \
   "$OUT/eval200_results.json" 2>/dev/null || true

# 3. snapshot canonical
bash scripts/snapshot_ckpt.sh nerf/lego/nerf >> "$OUT/progress.log" 2>&1

# 4. KiloNeRF re-distill + eval with the capacity fix
bash scripts/kilonerf_r5.sh > "$OUT/kilonerf_rerun.log" 2>&1
echo "$(date) kilonerf rerun rc=$?" >> "$OUT/progress.log"

# 5. the missing 16384 batch-probe point
timeout 2400 python -u scripts/ab_train_r4.py bf16_16384 \
  > "$OUT/ab_16384.log" 2>&1
echo "$(date) ab 16384 rc=$?" >> "$OUT/progress.log"
cp /tmp/ab_train_r4/results.json "$OUT/ab_16384.json" 2>/dev/null || true

touch "$OUT/phase3_done"
echo "$(date) phase3 complete" >> "$OUT/progress.log"
