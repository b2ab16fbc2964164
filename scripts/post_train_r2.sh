#!/bin/bash
# Round-2 post-training TPU sequence (ONE TPU process at a time; run only
# after the training watchdog is stopped). Targets the round-1 VERDICT
# items that need on-chip evidence:
#   #3 full-protocol eval (ALL 200 test frames, run.py:66 parity)
#   #2 bench with the train-step metric (BENCH_r2 source)
#   #4 ESS/ERT ablation re-measure on the trained checkpoint
#   #5 profiler trace + honest MFU split (docs/PERF.md numbers)
# Logs to /tmp/post_r2/*.log; touches /tmp/post_r2_done at the end.
set -u
cd "$(dirname "$0")/.."
DATA=/root/reference/data/nerf_synthetic
OUT=/tmp/post_r2
mkdir -p $OUT

run() {
  name=$1; t=$2; shift 2
  echo "=== $name start $(date +%T)" >> $OUT/progress.log
  timeout "$t" "$@" > $OUT/$name.log 2>&1
  echo "=== $name rc=$? $(date +%T)" >> $OUT/progress.log
}

# 1) FULL-protocol eval: all 200 test frames (cams [0,-1,1]), no video
#    (~200 x 4s + compile; evaluation_results.json lands in result_dir)
run eval_full 2400 python -u run.py --type evaluate --cfg_file configs/nerf/lego.yaml \
  train_dataset.data_root $DATA test_dataset.data_root $DATA \
  test_dataset.cams "[0,-1,1]" write_video False

# 2) bench: fwd + train-step rays/s (the driver metric)
run bench 1200 python -u bench.py

# 3) ESS/ERT ablation on the trained checkpoint, 2 frames
run ess_ert 1800 python -u test_ess_ert.py --cfg_file configs/nerf/lego.yaml \
  train_dataset.data_root $DATA test_dataset.data_root $DATA n_frames 2

# 3b) ESS/ERT pay-off A/B on 10 frames (VERDICT #4): ESS refocusing tightens
#     the sampled z-range into the occupied segment, so fewer coarse samples
#     should hold PSNR while cutting total MLP evals 256 -> 192 per ray.
#     Compare: no-ESS/ERT baseline, shipped ESS+ERT, ESS+ERT @ N_samples 32.
AB="run.py --type evaluate --cfg_file configs/nerf/lego.yaml
    train_dataset.data_root $DATA test_dataset.data_root $DATA
    test_dataset.cams [0,-1,20] write_video False use_pallas_integrate True"
run ess_off 900 python -u $AB enable_ess False enable_ert False \
  result_dir /tmp/post_r2/res_off
run ess_on 900 python -u $AB result_dir /tmp/post_r2/res_on
run ess_ns32 900 python -u $AB task_arg.N_samples 32 \
  result_dir /tmp/post_r2/res_ns32
run ess_ns32_ni96 900 python -u $AB task_arg.N_samples 32 \
  task_arg.N_importance 96 result_dir /tmp/post_r2/res_ns32_ni96

# 4) profiler trace + MFU split (eval tile + train chunk)
run profile 1200 python -u scripts/profile_tpu.py

# 5a) kilonerf stage breakdown (where do the 3x-slower cycles go?)
run kilo_diag 1200 python -u scripts/diag_kilonerf_tpu.py

# 6) hashgrid fine-convergence smoke (the round-1 failure: fine model stuck
#    at background; root cause = fine-pass compaction starving training —
#    now disabled under train=True). 6 epochs is enough to see loss_fine
#    move off ~0.08.
rm -rf /tmp/ws_hash
run hashgrid_smoke 2400 python -u train.py --cfg_file configs/nerf/lego_hashgrid.yaml \
  train_dataset.data_root $DATA test_dataset.data_root $DATA \
  train.epoch 6 eval_ep 3 save_latest_ep 100 save_ep 100 \
  workspace /tmp/ws_hash

# 5) marched fast-inference path timing on the trained ckpt
run marched 1200 python -u run.py --type marched --cfg_file configs/nerf/lego.yaml \
  train_dataset.data_root $DATA test_dataset.data_root $DATA

echo "ALL DONE $(date +%T)" >> $OUT/progress.log
touch /tmp/post_r2_done
