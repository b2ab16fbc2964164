#!/bin/bash
# Round-5 hash main run (VERDICT r4 #1): train lego_hashgrid_cellpack
# toward its FULL 120-epoch config budget as one clean scratch run, under
# the watchdog (auto-resume on tunnel wedges), wall-bounded by BUDGET_S.
#   scripts/train_hashgrid_r5.sh [BUDGET_S] [extra cfg overrides...]
# The previous (round-4, mixed-schedule) cellpack workspace is moved aside
# to *_r4probe so train.py starts clean instead of resuming a 150-iter-
# epoch schedule into a 500-iter-epoch run.
set -u
cd "$(dirname "$0")/.."
BUDGET=${1:-14400}
shift || true
DATA=/root/reference/data/nerf_synthetic
OUT=/tmp/post_r5
mkdir -p "$OUT"

WS=workspace/trained_model/nerf/lego/nerf_hashgrid_cellpack
if [ -d "$WS" ] && [ ! -f "$WS/.r5_clean" ]; then
  rm -rf "${WS}_r4probe"
  mv "$WS" "${WS}_r4probe"
fi
mkdir -p "$WS"
touch "$WS/.r5_clean"

export WATCHDOG_CMD="timeout $BUDGET python -u train.py \
--cfg_file configs/nerf/lego_hashgrid_cellpack.yaml \
train_dataset.data_root $DATA test_dataset.data_root $DATA \
eval_ep 10 save_latest_ep 2 save_ep 20 $*"
export WATCHDOG_LOG=/tmp/train_hash_r5.log
export WATCHDOG_MAX_RESTARTS=40
# slotpack-backward train program compiles in ~350 s (silent log); don't
# let the stale detector kill a healthy compile
export WATCHDOG_STALE=900
bash scripts/train_watchdog.sh > "$OUT/hash_watchdog_nohup.log" 2>&1 &
echo $! > /tmp/watchdog_r5.pid
echo "hash main run: budget ${BUDGET}s, watchdog $(cat /tmp/watchdog_r5.pid), log $WATCHDOG_LOG"
