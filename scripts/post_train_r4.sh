#!/bin/bash
# Round-4 post-training evidence sequence. Waits for the watchdog-managed
# main run to finish (train_done) — or runs immediately with --now — then,
# strictly sequentially (ONE TPU process at a time):
#   1. pick the better checkpoint (new run vs committed epoch-639) by a
#      6-frame val probe, install it as the canonical workspace checkpoint
#   2. snapshot checkpoints/ (+ the r4 run dir)
#   3. full 200-frame reference-protocol eval  -> EVAL_r4
#   4. ESS/ERT ablation harness refresh        -> ess_ert_results.json
#   5. bench.py                                -> EVAL_r4/log_bench.txt
#   6. gather microbench re-run (ADVICE r3 #2, varied inputs)
#   7. CPU test suite
# Logs under /tmp/post_r4/; touches /tmp/post_r4/done at the end.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/post_r4
mkdir -p "$OUT"
DATA=/root/reference/data/nerf_synthetic

if [ "${1:-}" != "--now" ]; then
  # Wait for training to be confirmed down. The ONLY safe signals are
  # /tmp/train_done (watchdog-confirmed completion) or the WATCHDOG itself
  # being gone (pid recorded by launch_train_r4.sh). Checking the training
  # PGID is RACY: the watchdog kill->relaunch window leaves the recorded
  # group dead for ~10 s, which round 4 measured the hard way — the post
  # sequence fired mid-run and ran TPU phases beside a live trainer.
  WPIDFILE=/tmp/watchdog_r4.pid
  while true; do
    if [ -f /tmp/train_done ] || [ -f /tmp/stop_training ]; then
      sleep 10; break
    fi
    WP=$(cat "$WPIDFILE" 2>/dev/null)
    if [ -n "$WP" ] && ! kill -0 "$WP" 2>/dev/null; then
      # watchdog gone: make sure the training group is too
      PG=$(cat /tmp/train_r1c.pgid 2>/dev/null)
      [ -n "$PG" ] && kill -0 "$PG" 2>/dev/null && { sleep 20; continue; }
      break
    fi
    sleep 20
  done
fi
echo "$(date) training down; starting post sequence" > "$OUT/progress.log"

# 1. checkpoint selection: compare the r4 run against the canonical dir
timeout 2400 python -u scripts/select_ckpt_r4.py > "$OUT/select.log" 2>&1
echo "$(date) select done rc=$?" >> "$OUT/progress.log"

bash scripts/snapshot_ckpt.sh >> "$OUT/progress.log" 2>&1

# 3. full 200-frame reference-protocol eval on HEAD
echo "$(date) eval200 start" >> "$OUT/progress.log"
timeout 3600 python -u run.py --type evaluate --cfg_file configs/nerf/lego.yaml \
  train_dataset.data_root $DATA test_dataset.data_root $DATA \
  > "$OUT/eval_full.log" 2>&1
echo "$(date) eval200 done rc=$?" >> "$OUT/progress.log"
cp workspace/result/nerf/lego/nerf/metrics/evaluation_results.json \
   "$OUT/eval200_results.json" 2>/dev/null || true

# 4. ESS/ERT harness refresh (full res, 2 real frames, warm compiles)
timeout 1800 python -u test_ess_ert.py --cfg_file configs/nerf/lego.yaml \
  train_dataset.data_root $DATA test_dataset.data_root $DATA \
  n_frames 2 H 800 W 800 > "$OUT/ess_ert.log" 2>&1
echo "$(date) ess_ert done rc=$?" >> "$OUT/progress.log"

# 5. driver benchmark on the final checkpoint
timeout 1200 python -u bench.py > "$OUT/bench.log" 2>&1
echo "$(date) bench done rc=$?" >> "$OUT/progress.log"

# 6. gather microbench with varied inputs (ADVICE r3 #2)
timeout 1500 python -u scripts/gather_microbench.py > "$OUT/gather.log" 2>&1
echo "$(date) gather done rc=$?" >> "$OUT/progress.log"

# 6b. post-sampler-fix profile (VERDICT r3 #2)
timeout 1500 python -u scripts/profile_tpu.py > "$OUT/profile.log" 2>&1
echo "$(date) profile done rc=$?" >> "$OUT/progress.log"
python3 scripts/trace_summary.py /tmp/jaxprof/eval 20 > "$OUT/trace_eval.txt" 2>&1 || true
python3 scripts/trace_summary.py /tmp/jaxprof/train 20 > "$OUT/trace_train.txt" 2>&1 || true

# 6c. hash-encoder diagnosis (VERDICT r3 #3)
timeout 2400 python -u scripts/diag_hash_r4.py > "$OUT/diag_hash.log" 2>&1
echo "$(date) diag_hash done rc=$?" >> "$OUT/progress.log"
python3 scripts/trace_summary.py /tmp/jaxprof/hash_corner 20 > "$OUT/trace_hash_corner.txt" 2>&1 || true
python3 scripts/trace_summary.py /tmp/jaxprof/hash_cellpack 20 > "$OUT/trace_hash_cellpack.txt" 2>&1 || true

# 6d. marched-path refocusing sweep (VERDICT r3 #7)
timeout 2400 python -u scripts/marched_sweep_r4.py > "$OUT/marched.log" 2>&1
echo "$(date) marched done rc=$?" >> "$OUT/progress.log"
cp /tmp/marched_sweep_r4.json "$OUT/" 2>/dev/null || true

# 7. CPU-mesh scaling artifact (VERDICT r3 #5) + CPU suite last
PALLAS_AXON_POOL_IPS= timeout 1200 python -u bench_scaling.py \
  --devices 8 --rays-per-device 1024 > "$OUT/scaling.log" 2>&1
cp scaling_results.json "$OUT/" 2>/dev/null || true
echo "$(date) scaling done rc=$?" >> "$OUT/progress.log"
PALLAS_AXON_POOL_IPS= timeout 1800 python -m pytest tests/ -q \
  > "$OUT/pytest.log" 2>&1
echo "$(date) pytest done rc=$?" >> "$OUT/progress.log"
touch "$OUT/done"
