#!/bin/bash
# Round-4 hashgrid training: publish a trained lego_hashgrid PSNR
# (VERDICT r3 #3 "Done" clause). Wall-clock-bounded: trains the full
# config budget under the watchdog until BUDGET_S runs out, then evals
# val frames from the latest checkpoint.
#   scripts/train_hashgrid_r4.sh [BUDGET_S] [extra overrides...]
set -u
cd "$(dirname "$0")/.."
BUDGET=${1:-1800}
shift || true
DATA=/root/reference/data/nerf_synthetic
OUT=/tmp/post_r4
mkdir -p "$OUT"

export WATCHDOG_CMD="timeout $BUDGET python -u train.py \
--cfg_file configs/nerf/lego_hashgrid.yaml \
train_dataset.data_root $DATA test_dataset.data_root $DATA \
eval_ep 5 save_latest_ep 2 $*"
export WATCHDOG_LOG=/tmp/train_hash_r4.log
export WATCHDOG_MAX_RESTARTS=20
bash scripts/train_watchdog.sh > "$OUT/hash_watchdog_nohup.log" 2>&1 &
WPID=$!
echo "hashgrid training: budget ${BUDGET}s, watchdog $WPID, log $WATCHDOG_LOG"
# wait for the budget (+ grace), then make sure everything is down
sleep $((BUDGET + 120))
kill "$WPID" 2>/dev/null
PG=$(cat /tmp/train_r1c.pgid 2>/dev/null)
[ -n "$PG" ] && { kill -- -"$PG" 2>/dev/null; sleep 5; kill -9 -- -"$PG" 2>/dev/null; }
sleep 5

# eval the latest hashgrid checkpoint on val frames
timeout 1200 python - <<'EOF' > "$OUT/hash_eval.log" 2>&1
import sys
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp
from nerf_tpu.config import make_cfg
from nerf_tpu.data.blender import make_dataset
from nerf_tpu.eval.metrics import psnr as psnr_fn
from nerf_tpu.render import occupancy as occ
from nerf_tpu.render.renderer import RenderOptions, render_image
from nerf_tpu.train.loop import make_density_fn
from run import _load_eval_params

DATA = "/root/reference/data/nerf_synthetic"
import os
cfg = make_cfg(os.environ.get("HASH_EVAL_CFG", "configs/nerf/lego_hashgrid.yaml"), [
    "train_dataset.data_root", DATA, "test_dataset.data_root", DATA])
opts = RenderOptions.from_cfg(cfg)
params = _load_eval_params(cfg, opts)
grid = occ.populate_from_density(
    occ.init_grid(jax.random.PRNGKey(1)),
    make_density_fn(params["coarse"], opts))
cfg2 = cfg.clone(); cfg2.test_dataset.split = "val"
ds = make_dataset(cfg2, "test")
K = jnp.asarray(ds.K)
ps = []
for i in (0, 16, 32, 48, 64, 80):
    out = render_image(params, jnp.asarray(ds.poses[i]), K,
                       jax.random.PRNGKey(i), ds.H, ds.W, opts, grid=grid)
    pred = np.clip(np.asarray(out.get("rgb_map", out["rgb_map_0"]),
                              np.float32), 0, 1)
    ps.append(float(psnr_fn(pred, ds.images[i])))
    print(f"frame {i}: {ps[-1]:.2f}", flush=True)
import json
print(json.dumps({"hashgrid_val_psnr": round(float(np.mean(ps)), 3),
                  "per_frame": [round(p, 2) for p in ps]}))
EOF
echo "hashgrid eval done rc=$?"
tail -2 "$OUT/hash_eval.log"
