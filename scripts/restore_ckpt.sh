#!/bin/bash
# Restore committed checkpoints from checkpoints/ into workspace/ so
# train.py resumes from them (full state: params + opt state + epoch +
# recorder). Safe to run before any training launch; does nothing for
# experiments without a committed snapshot and never overwrites a NEWER
# workspace checkpoint (compares the saved epoch numbers).
set -eu
cd "$(dirname "$0")/.."
[ -d checkpoints ] || { echo "no checkpoints/ dir"; exit 0; }
find checkpoints -name latest.npz | while read -r src; do
  rel=${src#checkpoints/}; rel=${rel%/latest.npz}
  dst=workspace/trained_model/$rel
  ep_src=$(python3 -c "import json;print(json.load(open('checkpoints/$rel/latest.json'))['epoch'])" 2>/dev/null || echo -1)
  ep_dst=$(python3 -c "import json;print(json.load(open('$dst/latest.json'))['epoch'])" 2>/dev/null || echo -1)
  # an empty workspace (no latest.npz) must ALWAYS restore — the epoch
  # comparison only applies when a destination checkpoint actually exists
  # (latest.json can be missing even when latest.npz was snapshotted)
  if [ -f "$dst/latest.npz" ] && [ "$ep_dst" -ge "$ep_src" ] 2>/dev/null; then
    echo "keep $dst (epoch $ep_dst >= $ep_src)"; continue
  fi
  mkdir -p "$dst"
  cp "$src" "$dst/latest.npz"
  cp "checkpoints/$rel/latest.json" "$dst/latest.json" 2>/dev/null || true
  echo "restored $rel at epoch $ep_src"
done
