#!/bin/bash
# Round-3 post-training TPU sequence (ONE TPU process at a time; run only
# after the training watchdog has exited). Delivers the evidence the
# round-2 VERDICT asked for:
#   #1 full-protocol eval: ALL 200 test frames (reference run.py:66 parity)
#   #3 fresh bench (train metric now measures the real fused training path)
#   #2 ESS/ERT pay-off A/B on the trained checkpoint (incl. fewer-samples)
#   #4 profiler trace + honest MFU split
#   #5 kilonerf stage diagnosis
#   #6 hashgrid post-fix convergence smoke
# Ordered so the results that GATE further design work (kilonerf diag,
# profiler split) land first, then the long full-protocol eval.
# Logs to /tmp/post_r3/*.log; touches /tmp/post_r3_done at the end.
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

# 1) kilonerf stage breakdown (where do the 3x-slower cycles go?)
run kilo_diag 1200 python -u scripts/diag_kilonerf_tpu.py

# 2) profiler trace + MFU split (eval tile + train chunk)
run profile 1200 python -u scripts/profile_tpu.py

# 3) FULL-protocol eval: all 200 test frames (cams [0,-1,1]), no video.
#    ~14 s/frame at 45k rays/s -> ~50 min + SSIM; timeout must cover it
#    (a timeout kill before summarize() loses evaluation_results.json).
run eval_full 4800 python -u run.py --type evaluate --cfg_file configs/nerf/lego.yaml \
  train_dataset.data_root $DATA test_dataset.data_root $DATA \
  test_dataset.cams "[0,-1,1]" write_video False use_pallas_integrate True

# 4) bench: fwd + train-step rays/s (train section now on the fused path)
run bench 1200 python -u bench.py

# 5) ESS/ERT pay-off A/B on 10 frames (VERDICT #2): compare no-ESS/ERT,
#    shipped ESS+ERT, and ESS+ERT with a reduced sample budget (ESS
#    refocusing concentrates the coarse samples in the occupied z-range,
#    so fewer samples should hold PSNR while cutting MLP evals).
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
# quality lever A/B (VERDICT #8): f32 eval of the bf16-trained weights
run eval_f32 900 python -u $AB network.dtype float32 \
  result_dir /tmp/post_r3/res_f32

# 6) classic ablation harness re-measure on the trained ckpt (2 frames)
run ess_ert 1800 python -u test_ess_ert.py --cfg_file configs/nerf/lego.yaml \
  train_dataset.data_root $DATA test_dataset.data_root $DATA n_frames 2

# 7) hashgrid fine-convergence smoke post root-cause fix (compaction now
#    disabled in training): 6 epochs is enough to see loss_fine move
rm -rf /tmp/ws_hash
run hashgrid_smoke 2400 python -u train.py --cfg_file configs/nerf/lego_hashgrid.yaml \
  train_dataset.data_root $DATA test_dataset.data_root $DATA \
  train.epoch 6 eval_ep 3 save_latest_ep 100 save_ep 100 \
  workspace /tmp/ws_hash

# 8) marched fast-inference path timing on the trained ckpt
run marched 1200 python -u run.py --type marched --cfg_file configs/nerf/lego.yaml \
  train_dataset.data_root $DATA test_dataset.data_root $DATA

echo "ALL DONE $(date +%T)" >> $OUT/progress.log
touch /tmp/post_r3_done
