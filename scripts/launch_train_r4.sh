#!/bin/bash
# Launch the round-4 main quality run under the watchdog.
#   scripts/launch_train_r4.sh scratch|cont [extra cfg overrides...]
#
# scratch: from-scratch 4096-ray run, decay horizon rescheduled to the
#          300-epoch budget (2x the reference's total-ray diet; the
#          screening showed batch size is throughput-free on this chip).
# cont:    re-annealed continuation of the epoch-639 checkpoint: 4096-ray
#          batches, lr restarts at 1.5e-4 and decays over the segment.
# Both train under their own exp dir (nerf_r4_<mode>) so the committed
# 30.8 dB checkpoint is never at risk; scripts/select_ckpt_r4.py promotes
# the winner afterwards.
set -eu
cd "$(dirname "$0")/.."
MODE=${1:-cont}
shift || true
DATA=/root/reference/data/nerf_synthetic

COMMON="python -u train.py --cfg_file configs/nerf/lego.yaml \
train_dataset.data_root $DATA test_dataset.data_root $DATA \
task_arg.N_rays 4096 ep_iter 500 exp_name nerf_r4_$MODE \
eval_ep 10 save_latest_ep 5"

case "$MODE" in
  scratch)
    CMD="$COMMON train.epoch 300 train.scheduler.decay_epochs 250 \
task_arg.precrop_iters 500 resume True"
    ;;
  cont)
    # 150 epochs x 500 iters x 4096 rays = 307M additional rays (2x the
    # model's lifetime diet); lr 1.2e-4 -> ~1.5e-5 over the segment
    # (screening: 4096-ray batches +0.215 dB at equal rays; reanneal ~=
    # plain at short horizon, so a mild restart with a long tail)
    CMD="$COMMON train.epoch 150 train.lr 1.2e-4 \
train.scheduler.decay_epochs 166 \
pretrain checkpoints/nerf/lego/nerf resume True"
    ;;
  *) echo "unknown mode $MODE"; exit 1;;
esac
CMD="$CMD $*"

echo "launching [$MODE]: $CMD"
export WATCHDOG_CMD="timeout 25000 $CMD"
export WATCHDOG_MAX_RESTARTS=${WATCHDOG_MAX_RESTARTS:-60}
export WATCHDOG_LOG=/tmp/train_r4.log
nohup bash scripts/train_watchdog.sh > /tmp/watchdog_r4_nohup.log 2>&1 &
echo $! > /tmp/watchdog_r4.pid
echo "watchdog pid $! ; log /tmp/train_r4.log"
