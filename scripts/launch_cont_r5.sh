#!/bin/bash
# Round-5 quality continuation (VERDICT r4 #2): continue the promoted r4
# champion (checkpoints/nerf/lego/nerf, epoch-149 of the 4096-ray
# continuation, lr ended 1.5e-5) with the batch size the >4096 probe
# selects. Mild re-anneal (lr 6e-5 -> ~8e-6) over the segment; rays/epoch
# held at 2.05M whatever the batch so the epoch schedule stays comparable.
#   scripts/launch_cont_r5.sh BATCH EPOCHS [extra overrides...]
set -eu
cd "$(dirname "$0")/.."
BATCH=${1:-4096}
EPOCHS=${2:-100}
shift 2 || true
DATA=/root/reference/data/nerf_synthetic
EP_ITER=$((4096 * 500 / BATCH))

CMD="python -u train.py --cfg_file configs/nerf/lego.yaml \
train_dataset.data_root $DATA test_dataset.data_root $DATA \
task_arg.N_rays $BATCH ep_iter $EP_ITER exp_name nerf_r5_cont \
eval_ep 20 save_latest_ep 5 save_ep 1000 \
train.epoch $EPOCHS train.lr 6e-5 train.scheduler.decay_epochs $((EPOCHS + EPOCHS / 10)) \
pretrain checkpoints/nerf/lego/nerf resume True $*"

echo "launching r5 continuation: $CMD"
export WATCHDOG_CMD="timeout 7200 $CMD"
export WATCHDOG_MAX_RESTARTS=${WATCHDOG_MAX_RESTARTS:-30}
export WATCHDOG_LOG=/tmp/train_r5_cont.log
export WATCHDOG_STALE=600
nohup bash scripts/train_watchdog.sh > /tmp/watchdog_r5cont_nohup.log 2>&1 &
echo $! > /tmp/watchdog_r5.pid
echo "watchdog pid $! ; log /tmp/train_r5_cont.log"
