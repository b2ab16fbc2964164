#!/bin/bash
# Round-5 phase-4 (stretch evidence): waits for phase3, then
#   1. FULL 200-frame reference-protocol eval of the converged cellpack
#      hashgrid checkpoint (upgrades EVAL_r5's 20-frame subset number;
#      ~75 min at the measured 22.5 s/frame)
#   2. corner-layout wall-matched run (CORNER_S wall-clock, publishes
#      the ray deficit + whatever val PSNR it reaches)
# Logs under /tmp/post_r5; touches /tmp/post_r5/phase4_done.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/post_r5
mkdir -p "$OUT"
DATA=/root/reference/data/nerf_synthetic
CFG=configs/nerf/lego_hashgrid_cellpack.yaml
CORNER_S=${CORNER_S:-1500}

while [ ! -f "$OUT/phase3_done" ]; do sleep 30; done
echo "$(date) phase4 start" >> "$OUT/progress.log"

# 1. full 200-frame hash eval
timeout 7200 python -u run.py --type evaluate --cfg_file "$CFG" \
  train_dataset.data_root $DATA test_dataset.data_root $DATA \
  write_video False render_path False render_tile_rays 1024 \
  > "$OUT/hash_eval200_full.log" 2>&1
echo "$(date) hash full eval200 rc=$?" >> "$OUT/progress.log"
cp workspace/result/nerf/lego/nerf_hashgrid_cellpack/metrics/evaluation_results.json \
   "$OUT/hash_eval200_full.json" 2>/dev/null || true

# 2. corner wall-matched run (scratch, compressed schedule like the
# cellpack main run; val probe every epoch so the kill point has a score)
WS=workspace/trained_model/nerf/lego/nerf_hashgrid
rm -rf "$WS"
timeout $((CORNER_S + 400)) python -u train.py \
  --cfg_file configs/nerf/lego_hashgrid.yaml \
  train_dataset.data_root $DATA test_dataset.data_root $DATA \
  train.epoch 80 train.scheduler.decay_epochs 67 \
  eval_ep 1 save_latest_ep 1 save_ep 1000 \
  > "$OUT/corner_train.log" 2>&1 &
CPID=$!
( sleep "$CORNER_S"; kill "$CPID" 2>/dev/null ) &
KPID=$!
wait "$CPID"
kill "$KPID" 2>/dev/null
echo "$(date) corner run done rc=$?" >> "$OUT/progress.log"

touch "$OUT/phase4_done"
echo "$(date) phase4 complete" >> "$OUT/progress.log"
