#!/bin/bash
# Round-2 TPU burst 1: validate the new training paths on the real chip and
# A/B the train-step configurations. ONE TPU process at a time, serial.
set -u
cd /root/repo
DATA=/root/reference/data/nerf_synthetic
OUT=/tmp/burst1
mkdir -p $OUT

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%T))" >> $OUT/progress.log
  timeout 1200 "$@" > $OUT/$name.log 2>&1
  echo "=== $name done rc=$? ($(date +%T))" >> $OUT/progress.log
}

TRAIN_COMMON="train.py --cfg_file configs/nerf/lego.yaml
  train_dataset.data_root $DATA test_dataset.data_root $DATA
  train.epoch 1 ep_iter 100 eval_ep 1000 save_latest_ep 1000 save_ep 1000
  grid_rebuild_ep 1000"

# 1) on-chip grad parity for the fused MLP pair + integrate kernel
run gradparity python -u scripts/validate_train_grads_tpu.py

# 2) train-step A/B: {query: xla|pallas} x {integrate: xla|pallas}, 1024 rays
rm -rf /tmp/ws_a /tmp/ws_b /tmp/ws_c /tmp/ws_d /tmp/ws_e /tmp/ws_f
run train_xla      python -u $TRAIN_COMMON workspace /tmp/ws_a use_pallas_kernels False
run train_pallas   python -u $TRAIN_COMMON workspace /tmp/ws_b use_pallas_kernels True
run train_xla_int  python -u $TRAIN_COMMON workspace /tmp/ws_c use_pallas_kernels False use_pallas_integrate True
run train_pal_int  python -u $TRAIN_COMMON workspace /tmp/ws_d use_pallas_kernels True use_pallas_integrate True

# 3) batch-size scaling of the best-guess config (4096-ray batches)
run train_xla_4096 python -u $TRAIN_COMMON workspace /tmp/ws_e use_pallas_kernels False task_arg.N_rays 4096 ep_iter 50
run train_pal_4096 python -u $TRAIN_COMMON workspace /tmp/ws_f use_pallas_kernels True task_arg.N_rays 4096 ep_iter 50

# 4) the bench (fwd + NEW train metric)
run bench python -u bench.py

echo "ALL DONE $(date +%T)" >> $OUT/progress.log
touch /tmp/burst1_done
