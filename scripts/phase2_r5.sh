#!/bin/bash
# Round-5 phase-2 TPU sequence. Waits for the hash post sequence
# (post_hash_r5.sh touches /tmp/post_r5/hash_done), then strictly
# sequentially (ONE TPU process at a time), deadline-aware:
#   1. >4096 batch-scaling probes (VERDICT r4 #2): ab_train_r4.py
#      bf16_8192 bf16_16384
#   2. KiloNeRF distilled quality (VERDICT r4 #6): kilonerf_r5.sh
#   3. corner-layout wall-matched comparison run (VERDICT r4 #1's
#      "corner comparison point") if >=CORNER_S left before DEADLINE
# DEADLINE: unix-seconds hard stop for STARTING new phases (default
# now+9000). Logs under /tmp/post_r5; touches /tmp/post_r5/phase2_done.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/post_r5
mkdir -p "$OUT"
DATA=/root/reference/data/nerf_synthetic
DEADLINE=${DEADLINE:-$(($(date +%s) + 9000))}
CORNER_S=${CORNER_S:-1500}

left() { echo $((DEADLINE - $(date +%s))); }

while [ ! -f "$OUT/hash_done" ]; do sleep 30; done
echo "$(date) phase2 start ($(left)s to deadline)" >> "$OUT/progress.log"

# 1. batch-scaling probes >4096
if [ "$(left)" -gt 600 ]; then
  timeout $(( $(left) < 2400 ? $(left) : 2400 )) \
    python -u scripts/ab_train_r4.py bf16_8192 bf16_16384 \
    > "$OUT/ab_batch_probe.log" 2>&1
  echo "$(date) ab batch probe rc=$?" >> "$OUT/progress.log"
  cp /tmp/ab_train_r4/results.json "$OUT/ab_batch_probe.json" 2>/dev/null || true
else
  echo "$(date) SKIP ab batch probe (deadline)" >> "$OUT/progress.log"
fi

# 2. KiloNeRF distilled quality
if [ "$(left)" -gt 1200 ]; then
  bash scripts/kilonerf_r5.sh > "$OUT/kilonerf_phase.log" 2>&1
  echo "$(date) kilonerf rc=$?" >> "$OUT/progress.log"
else
  echo "$(date) SKIP kilonerf (deadline)" >> "$OUT/progress.log"
fi

# 3. corner wall-matched comparison (scratch, compressed schedule like the
# cellpack main run; publishes whatever epoch it reaches in CORNER_S —
# the point is the measured ray deficit at equal wall-clock)
if [ "$(left)" -gt $((CORNER_S + 600)) ]; then
  WS=workspace/trained_model/nerf/lego/nerf_hashgrid
  rm -rf "$WS"
  timeout $((CORNER_S + 500)) python -u train.py \
    --cfg_file configs/nerf/lego_hashgrid.yaml \
    train_dataset.data_root $DATA test_dataset.data_root $DATA \
    train.epoch 80 train.scheduler.decay_epochs 67 \
    eval_ep 1 save_latest_ep 1 save_ep 1000 \
    > "$OUT/corner_train.log" 2>&1 &
  CPID=$!
  # wall-bound the RUN, not the timeout grace: kill the exact child at
  # CORNER_S so the last val probe/save can flush via SIGTERM handler
  ( sleep "$CORNER_S"; kill "$CPID" 2>/dev/null ) &
  wait "$CPID"
  echo "$(date) corner run done rc=$?" >> "$OUT/progress.log"
else
  echo "$(date) SKIP corner run (deadline)" >> "$OUT/progress.log"
fi

touch "$OUT/phase2_done"
echo "$(date) phase2 complete" >> "$OUT/progress.log"
