#!/bin/bash
# Round-5 KiloNeRF distilled-quality evidence (VERDICT r4 #6): distill the
# voxel-routed student from the promoted champion teacher, then evaluate
# it against GROUND TRUTH test frames (every 10th = 20 frames, the subset
# protocol post_train_r3c used for the hash path) and record PSNR/SSIM at
# the path's measured rays/s.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/post_r5
mkdir -p "$OUT"
DATA=/root/reference/data/nerf_synthetic

timeout 1800 python -u distill_kilonerf.py --cfg_file configs/nerf/lego.yaml \
  train_dataset.data_root $DATA test_dataset.data_root $DATA \
  kilo.steps 4000 > "$OUT/distill.log" 2>&1
echo "distill rc=$?"
tail -3 "$OUT/distill.log"

timeout 3600 python -u run.py --type evaluate \
  --cfg_file configs/nerf/lego_kilonerf.yaml \
  train_dataset.data_root $DATA test_dataset.data_root $DATA \
  test_dataset.cams "[0,-1,10]" write_video False render_path False \
  > "$OUT/kilonerf_eval.log" 2>&1
echo "kilonerf eval rc=$?"
cp workspace/result/nerf/lego/nerf/metrics/evaluation_results.json \
   "$OUT/kilonerf_eval_results.json" 2>/dev/null || true
tail -5 "$OUT/kilonerf_eval.log"
