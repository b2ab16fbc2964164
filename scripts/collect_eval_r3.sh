#!/bin/bash
# Collect round-3 evidence into EVAL_r3/ (committed). Run after
# scripts/post_train_r3.sh (and optionally train_scenes_r3.sh) completed.
set -u
cd "$(dirname "$0")/.."
OUT=EVAL_r3
mkdir -p $OUT

RES=workspace/result/nerf/lego/nerf
# full-protocol 200-frame eval artifacts
cp $RES/metrics/evaluation_results.json $OUT/ 2>/dev/null ||
  cp $RES/evaluation_results.json $OUT/ 2>/dev/null || true
cp $RES/metrics/evaluation_summary.txt $OUT/ 2>/dev/null ||
  cp $RES/evaluation_summary.txt $OUT/ 2>/dev/null || true
cp $RES/images/view000_pred.png $OUT/ 2>/dev/null || true

# A/B ablation table (single-process runner, scripts/ab_eval_r3.py)
cp /tmp/post_r3/ab_results.json $OUT/ 2>/dev/null || true

# harness + diag + profile + bench logs
for f in bench ess_ert kilo_diag kilo_diag2 profile hashgrid_smoke hashgrid_150 distill marched eval_full ab_runner; do
  [ -f /tmp/post_r3/$f.log ] && grep -v WARNING /tmp/post_r3/$f.log | tail -40 \
    > $OUT/log_$f.txt
done

# per-scene evals from the breadth run
for log in /tmp/scenes_r3/eval_*.log; do
  [ -f "$log" ] || continue
  scene=$(basename "$log" .log | sed 's/eval_//')
  src=$(find workspace/result/nerf/$scene -name evaluation_results.json 2>/dev/null | head -1)
  [ -n "$src" ] && cp "$src" $OUT/scene_$scene.json
done

echo "collected into $OUT/:"
ls -la $OUT/
