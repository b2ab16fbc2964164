#!/bin/bash
# Watchdog for the lego training run. Launches training itself in its OWN
# process group (setsid) and records the group leader PID, so a stale-log
# wedge (tunnel futex deadlock) is recovered by killing exactly that group
# — never by pattern, and never orphaning the python (the round-1
# continuation bug: recording the shell wrapper's PID left the real python
# alive while relaunching a second TPU process).
LOG=${WATCHDOG_LOG:-/tmp/train_r1c.log}
PGIDFILE=/tmp/train_r1c.pgid
CMD=${WATCHDOG_CMD:-"timeout 25000 python -u train.py --cfg_file configs/nerf/lego.yaml train_dataset.data_root /root/reference/data/nerf_synthetic test_dataset.data_root /root/reference/data/nerf_synthetic"}

# fresh run: truncate the (append-mode) log and clear the done marker so a
# stale "training complete" from a PREVIOUS run can't mask a crash of this
# one (a crashed new run would otherwise grep the old line, touch
# /tmp/train_done, and falsely signal completion)
: > "$LOG"
rm -f /tmp/train_done
# a stale stop request from an earlier bench run must not kill this run
rm -f /tmp/stop_training

launch() {
  setsid bash -c "echo \$\$ > $PGIDFILE; exec $CMD >> $LOG 2>&1" &
  sleep 2
  echo "$(date) launched pgid $(cat $PGIDFILE)" >> /tmp/watchdog.log
}

kill_group() {
  local pg=$(cat "$PGIDFILE" 2>/dev/null)
  [ -n "$pg" ] || return
  kill -- -"$pg" 2>/dev/null; sleep 5
  kill -9 -- -"$pg" 2>/dev/null; sleep 3
}

launch
restarts=0
# WATCHDOG_MAX_RESTARTS: raise when the tunnel wedges repeatedly
# (round-4: wedge windows of 30-45 min at ~6 min per relaunch cycle)
while [ $restarts -lt ${WATCHDOG_MAX_RESTARTS:-6} ]; do
  sleep 60
  # cooperative stop: bench.py (run by the round driver on the same chip)
  # touches this file and waits; yield the TPU and exit cleanly
  if [ -f /tmp/stop_training ]; then
    echo "$(date) stop_training signal; yielding TPU" >> /tmp/watchdog.log
    kill_group
    exit 0
  fi
  PG=$(cat "$PGIDFILE" 2>/dev/null)
  if ! kill -0 "$PG" 2>/dev/null; then
    if grep -q "training complete" "$LOG" 2>/dev/null; then
      echo "$(date) training complete" >> /tmp/watchdog.log
      touch /tmp/train_done
      exit 0
    fi
    echo "$(date) process gone without completing; restarting" >> /tmp/watchdog.log
    launch
    restarts=$((restarts+1))
    continue
  fi
  age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
  # WATCHDOG_STALE: raise when the relay compile service is degraded
  # (observed >15 min compiles; a mid-compile kill just recompiles)
  if [ "$age" -gt "${WATCHDOG_STALE:-300}" ]; then
    echo "$(date) log stale ${age}s; killing group $PG" >> /tmp/watchdog.log
    kill_group
    launch
    restarts=$((restarts+1))
  fi
done
echo "$(date) restart cap reached" >> /tmp/watchdog.log
