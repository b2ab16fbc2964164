#!/bin/bash
# Round-3 part C: short TPU jobs after the hashgrid training stretch.
#   - KiloNeRF occupancy-weighted distillation (student quality evidence)
#   - ESS/ERT classic harness re-measure (compile-clean threshold sweep)
#   - marched fast-inference timing on the trained checkpoint
#   - hashgrid checkpoint eval (10 frames)
# ONE TPU process at a time; run only when no trainer is active.
set -u
cd "$(dirname "$0")/.."
DATA=/root/reference/data/nerf_synthetic
OUT=/tmp/post_r3
mkdir -p $OUT

run() {
  name=$1; t=$2; shift 2
  echo "=== $name start $(date +%T)" >> $OUT/progress.log
  timeout "$t" "$@" > $OUT/$name.log 2>&1
  echo "=== $name rc=$? $(date +%T)" >> $OUT/progress.log
}

run distill 1500 python -u distill_kilonerf.py --cfg_file configs/nerf/lego.yaml \
  train_dataset.data_root $DATA test_dataset.data_root $DATA \
  kilo.steps 3000

run ess_ert 1500 python -u test_ess_ert.py --cfg_file configs/nerf/lego.yaml \
  train_dataset.data_root $DATA test_dataset.data_root $DATA n_frames 2

run marched 900 python -u run.py --type marched --cfg_file configs/nerf/lego.yaml \
  train_dataset.data_root $DATA test_dataset.data_root $DATA

run hashgrid_eval 1500 python -u run.py --type evaluate \
  --cfg_file configs/nerf/lego_hashgrid.yaml \
  train_dataset.data_root $DATA test_dataset.data_root $DATA \
  test_dataset.cams "[0,-1,20]" write_video False

echo "ALL DONE C $(date +%T)" >> $OUT/progress.log
touch /tmp/post_r3c_done
