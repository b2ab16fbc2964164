#!/bin/bash
# Watchdog for the lego training run: if the log stops advancing for >300s
# while the process still exists (futex wedge), kill the EXACT recorded
# PID tree and relaunch. Restart count capped.
LOG=/tmp/train_r1c.log
PIDFILE=/tmp/train_r1c.pid
CMD="timeout 25000 python -u train.py --cfg_file configs/nerf/lego.yaml train_dataset.data_root /root/reference/data/nerf_synthetic test_dataset.data_root /root/reference/data/nerf_synthetic"
restarts=0
while [ $restarts -lt 5 ]; do
  sleep 60
  WPID=$(awk '{print $2}' "$PIDFILE")
  if ! kill -0 "$WPID" 2>/dev/null; then
    # process gone: finished normally (or timeout) -> stop watching
    if grep -q "epoch 599 done" "$LOG" 2>/dev/null; then exit 0; fi
    # exited without completing (crash/timeout): do not auto-restart past cap
    if [ ! -e /tmp/train_done ]; then
      echo "$(date) train process gone; restarting" >> /tmp/watchdog.log
      nohup $CMD >> "$LOG" 2>&1 &
      echo "PID $!" > "$PIDFILE"
      restarts=$((restarts+1))
    fi
    continue
  fi
  age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
  if [ "$age" -gt 300 ]; then
    echo "$(date) log stale ${age}s; killing $WPID tree" >> /tmp/watchdog.log
    CHILD=$(ps -o pid= --ppid "$WPID" | tr -d ' ')
    kill "$WPID" $CHILD 2>/dev/null; sleep 5
    kill -9 "$WPID" $CHILD 2>/dev/null; sleep 3
    nohup $CMD >> "$LOG" 2>&1 &
    echo "PID $!" > "$PIDFILE"
    restarts=$((restarts+1))
  fi
done
