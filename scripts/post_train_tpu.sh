#!/bin/bash
# Post-training TPU sequence (ONE process at a time; run only after train.py
# has exited). Logs to /tmp/post_train/*.log. Budget ~2h on the tunnel v5e.
set -x
mkdir -p /tmp/post_train
DATA=/root/reference/data/nerf_synthetic

# 1. test-set evaluation on 25 frames (cams [0,-1,8]) + short spiral video
timeout 2400 python -u run.py --type evaluate --cfg_file configs/nerf/lego.yaml \
  test_dataset.data_root $DATA train_dataset.data_root $DATA \
  test_dataset.cams "[0,-1,8]" write_video True render_num 30 \
  > /tmp/post_train/eval.log 2>&1

# 2. benchmark (XLA default + pallas + integrate kernel + tile/compaction sweep)
timeout 900 python -u bench.py > /tmp/post_train/bench_xla.log 2>&1
timeout 900 python -u bench.py --pallas > /tmp/post_train/bench_pallas.log 2>&1
timeout 900 python -u bench.py --pallas --ktile 4096 > /tmp/post_train/bench_pallas_kt4096.log 2>&1
timeout 900 python -u bench.py --pallas --ktile 8192 > /tmp/post_train/bench_pallas_kt8192.log 2>&1
timeout 900 python -u bench.py --no-pallas-integrate > /tmp/post_train/bench_no_integrate.log 2>&1
timeout 900 python -u bench.py --tile 16384 > /tmp/post_train/bench_t16384.log 2>&1
timeout 900 python -u bench.py --tile 32768 > /tmp/post_train/bench_t32768.log 2>&1
timeout 900 python -u bench.py --compaction 0.5 > /tmp/post_train/bench_comp05.log 2>&1
timeout 900 python -u bench.py --compaction 0.35 > /tmp/post_train/bench_comp035.log 2>&1

# 2b. compaction quality check on a small frame subset
timeout 1200 python -u run.py --type evaluate --cfg_file configs/nerf/lego.yaml \
  test_dataset.data_root $DATA train_dataset.data_root $DATA \
  test_dataset.cams "[0,40,5]" ess_compaction 0.5 \
  result_dir /tmp/post_train/result_comp05 > /tmp/post_train/eval_comp05.log 2>&1

# 3. Pallas integrate kernel TPU validation + timing
timeout 900 python -u scripts/validate_integrate_tpu.py > /tmp/post_train/integrate.log 2>&1

# 4. marched fast-inference timing (with and without compaction)
timeout 1200 python -u run.py --type marched --cfg_file configs/nerf/lego.yaml \
  test_dataset.data_root $DATA train_dataset.data_root $DATA \
  > /tmp/post_train/marched.log 2>&1
timeout 1200 python -u run.py --type marched --cfg_file configs/nerf/lego.yaml \
  test_dataset.data_root $DATA train_dataset.data_root $DATA \
  ess_compaction 0.4 > /tmp/post_train/marched_comp.log 2>&1

# 5. ESS/ERT ablation matrix (the reference's test_ess_ert protocol)
timeout 1800 python -u test_ess_ert.py --cfg_file configs/nerf/lego.yaml \
  test_dataset.data_root $DATA train_dataset.data_root $DATA \
  n_frames 2 H 400 W 400 > /tmp/post_train/ess_ert.log 2>&1

# 5a. hashgrid-encoder training evidence (own exp dir; short budget)
timeout 2400 python -u train.py --cfg_file configs/nerf/lego_hashgrid.yaml \
  train_dataset.data_root $DATA test_dataset.data_root $DATA \
  train.epoch 15 eval_ep 15 > /tmp/post_train/hashgrid_train.log 2>&1
timeout 1200 python -u run.py --type evaluate --cfg_file configs/nerf/lego_hashgrid.yaml \
  train_dataset.data_root $DATA test_dataset.data_root $DATA \
  test_dataset.cams "[0,40,5]" > /tmp/post_train/hashgrid_eval.log 2>&1

# 5b. img_fit end-to-end evidence (train 20 epochs + eval; ~5 min)
timeout 900 python -u train.py --cfg_file configs/img_fit/lego_view0.yaml \
  train_dataset.data_root $DATA train.epoch 20 \
  > /tmp/post_train/img_fit_train.log 2>&1
timeout 600 python -u run.py --type evaluate --cfg_file configs/img_fit/lego_view0.yaml \
  train_dataset.data_root $DATA > /tmp/post_train/img_fit_eval.log 2>&1

# 6. KiloNeRF distillation (full budget) + fast-inference timing
timeout 3600 python -u distill_kilonerf.py --cfg_file configs/nerf/lego.yaml \
  test_dataset.data_root $DATA train_dataset.data_root $DATA \
  kilo.steps 4000 > /tmp/post_train/distill.log 2>&1
timeout 1200 python -u run.py --type network --cfg_file configs/nerf/lego_kilonerf.yaml \
  test_dataset.data_root $DATA train_dataset.data_root $DATA \
  > /tmp/post_train/kilo_network.log 2>&1

echo DONE > /tmp/post_train/DONE
