#!/bin/bash
# Round-2 TPU burst 2: grad diagnosis, kilonerf stage profile, jax.profiler
# traces, ESS/ERT-off eval check, f32-vs-bf16 train A/B @4096.
set -u
cd /root/repo
DATA=/root/reference/data/nerf_synthetic
OUT=/tmp/burst2
mkdir -p $OUT

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%T))" >> $OUT/progress.log
  timeout 1500 "$@" > $OUT/$name.log 2>&1
  echo "=== $name done rc=$? ($(date +%T))" >> $OUT/progress.log
}

# 1) per-leaf fused-gradient diagnosis (pallas-bwd vs xla-recompute vs xla)
run diag_grads python -u scripts/diag_fused_grads_tpu.py

# 2) kilonerf stage timing (locate the 3x slowdown)
run kilonerf python -u scripts/bench_kilonerf_tpu.py

# 3) profiler traces + MFU summary (xla and pallas query paths)
run profile_xla python -u scripts/profile_tpu.py
run profile_pallas python -u scripts/profile_tpu.py --pallas

# 4) does the eval protocol (ESS+ERT on) cost PSNR vs dense eval?
run eval_dense python -u run.py --type evaluate --cfg_file configs/nerf/lego.yaml \
  test_dataset.data_root $DATA train_dataset.data_root $DATA \
  test_dataset.cams "[0,40,8]" enable_ess False enable_ert False \
  result_dir /tmp/burst2/result_dense
run eval_essert python -u run.py --type evaluate --cfg_file configs/nerf/lego.yaml \
  test_dataset.data_root $DATA train_dataset.data_root $DATA \
  test_dataset.cams "[0,40,8]" \
  result_dir /tmp/burst2/result_essert

# 5) clean train-step A/Bs via the bench harness (warmup chunk + timed chunk)
run bench_pallas python -u bench.py --pallas
run bench_pallas_4096 python -u bench.py --pallas --train-rays 4096
run bench_xla_4096 python -u bench.py --train-rays 4096
run bench_pallas_4096_f32 python -u bench.py --pallas --train-rays 4096 --f32

echo "ALL DONE $(date +%T)" >> $OUT/progress.log
touch /tmp/burst2_done
