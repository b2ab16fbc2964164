#!/bin/bash
# Snapshot the latest training checkpoint(s) into the tracked checkpoints/
# tree so training progress survives round boundaries (workspace/ is
# gitignored and the machine is wiped between rounds — round 1's 600-epoch
# lego checkpoint was lost exactly this way).
#
# Usage: scripts/snapshot_ckpt.sh [task/scene/exp ...]
#   default: nerf/lego/nerf
# Restore:  scripts/restore_ckpt.sh  (before train.py; it then auto-resumes)
set -eu
cd "$(dirname "$0")/.."
targets=${@:-nerf/lego/nerf}
for t in $targets; do
  src=workspace/trained_model/$t
  [ -f "$src/latest.npz" ] || { echo "no checkpoint at $src"; continue; }
  dst=checkpoints/$t
  mkdir -p "$dst"
  cp "$src/latest.npz" "$dst/latest.npz"
  cp "$src/latest.json" "$dst/latest.json" 2>/dev/null || true
  echo "snapshotted $src -> $dst ($(du -h "$dst/latest.npz" | cut -f1), epoch $(python3 -c "import json;print(json.load(open('$dst/latest.json'))['epoch'])" 2>/dev/null || echo '?'))"
done
