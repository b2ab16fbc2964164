#!/bin/bash
# Round-3 post-training sequence, part B: the steps after the 200-frame
# eval (which completed: PSNR 30.80 +- 1.33 / SSIM 0.9507 on 200 frames).
# Part A (scripts/post_train_r3.sh) was stopped when a sampling-rewrite
# shape bug crashed bench/ess_off/ess_on; the fix is CPU-test-validated
# (38 tests) and this re-runs those steps plus the rest.
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

# fresh bench on the branchless sampler (fwd + fused train path)
run bench 1200 python -u bench.py

# kilonerf stage re-diagnosis: block-diag packed mlp + bucketed rank
run kilo_diag2 1200 python -u scripts/diag_kilonerf_tpu.py

# ESS/ERT pay-off A/B on 10 frames + dtype lever
AB="run.py --type evaluate --cfg_file configs/nerf/lego.yaml
    train_dataset.data_root $DATA test_dataset.data_root $DATA
    test_dataset.cams [0,-1,20] write_video False use_pallas_integrate True"
run ess_off 900 python -u $AB enable_ess False enable_ert False \
  result_dir /tmp/post_r3/res_off
run ess_on 900 python -u $AB result_dir /tmp/post_r3/res_on
run ess_ns32 900 python -u $AB task_arg.N_samples 32 \
  result_dir /tmp/post_r3/res_ns32
run ess_ns32_ni96 900 python -u $AB task_arg.N_samples 32 \
  task_arg.N_importance 96 result_dir /tmp/post_r3/res_ns32_ni96
run ess_ns48_ni96 900 python -u $AB task_arg.N_samples 48 \
  task_arg.N_importance 96 result_dir /tmp/post_r3/res_ns48_ni96
run eval_f32 900 python -u $AB network.dtype float32 \
  result_dir /tmp/post_r3/res_f32

# classic ablation harness re-measure (compile-clean threshold sweep)
run ess_ert 1800 python -u test_ess_ert.py --cfg_file configs/nerf/lego.yaml \
  train_dataset.data_root $DATA test_dataset.data_root $DATA n_frames 2

# hashgrid fine-convergence smoke post root-cause fix
rm -rf /tmp/ws_hash
run hashgrid_smoke 2400 python -u train.py --cfg_file configs/nerf/lego_hashgrid.yaml \
  train_dataset.data_root $DATA test_dataset.data_root $DATA \
  train.epoch 6 eval_ep 3 save_latest_ep 100 save_ep 100 \
  workspace /tmp/ws_hash

# kilonerf distillation on the trained teacher (occupancy-weighted)
run distill 1500 python -u distill_kilonerf.py --cfg_file configs/nerf/lego.yaml \
  train_dataset.data_root $DATA test_dataset.data_root $DATA \
  kilo.steps 3000

# marched fast-inference path timing on the trained ckpt
run marched 1200 python -u run.py --type marched --cfg_file configs/nerf/lego.yaml \
  train_dataset.data_root $DATA test_dataset.data_root $DATA

echo "ALL DONE B $(date +%T)" >> $OUT/progress.log
touch /tmp/post_r3_done
