#!/usr/bin/env python
"""Pick the better lego checkpoint (round-5 continuation vs the committed epoch-639)
by a val-frame probe and install it as the canonical workspace checkpoint
(workspace/trained_model/nerf/lego/nerf — what bench.py / run.py use).

The round-4 main run trains under its own exp dir (nerf_r5*) so a regression
can never clobber the 30.8 dB floor; this script promotes it only if it
measures better. Run on the TPU with no other TPU process.
"""
import glob
import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, ".")

DATA = "/root/reference/data/nerf_synthetic"
CANON = "workspace/trained_model/nerf/lego/nerf"
VAL_FRAMES = (0, 16, 32, 48, 64, 80)


def main():
    import jax
    import jax.numpy as jnp

    from nerf_tpu.config import make_cfg
    from nerf_tpu.data.blender import make_dataset
    from nerf_tpu.eval.metrics import psnr as psnr_fn
    from nerf_tpu.render import occupancy as occ
    from nerf_tpu.render.renderer import RenderOptions, render_image
    from nerf_tpu.train.checkpoint import load_params
    from nerf_tpu.train.loop import init_nerf_params, make_density_fn

    cfg = make_cfg("configs/nerf/lego.yaml", [
        "train_dataset.data_root", DATA, "test_dataset.data_root", DATA])
    opts = RenderOptions.from_cfg(cfg)
    template = init_nerf_params(jax.random.PRNGKey(0), opts)

    cands = {"canonical": CANON}
    for d in sorted(glob.glob("workspace/trained_model/nerf/lego/nerf_r5*")):
        if os.path.exists(os.path.join(d, "latest.npz")):
            cands[os.path.basename(d)] = d
    print("candidates:", cands, flush=True)

    val_cfg = cfg.clone()
    val_cfg.test_dataset.split = "val"
    ds = make_dataset(val_cfg, "test")
    K = jnp.asarray(ds.K)

    scores = {}
    for name, d in cands.items():
        params = load_params(d, template)
        if params is None:
            print(f"{name}: no loadable checkpoint in {d}", flush=True)
            continue
        grid = occ.populate_from_density(
            occ.init_grid(jax.random.PRNGKey(1)),
            make_density_fn(params["coarse"], opts))
        psnrs = []
        for i in VAL_FRAMES:
            out = render_image(params, jnp.asarray(ds.poses[i]), K,
                               jax.random.PRNGKey(i), ds.H, ds.W, opts,
                               grid=grid)
            pred = np.clip(np.asarray(out.get("rgb_map", out["rgb_map_0"]),
                                      np.float32), 0, 1)
            psnrs.append(float(psnr_fn(pred, ds.images[i])))
        scores[name] = float(np.mean(psnrs))
        print(f"{name}: val psnr {scores[name]:.3f} "
              f"({[round(p, 2) for p in psnrs]})", flush=True)

    if not scores:
        print("no candidates scored; leaving canonical untouched")
        return
    # ADVICE r4: if the canonical checkpoint failed to score, a degraded
    # run could silently replace it — refuse to promote without the
    # canonical comparison point
    if "canonical" not in scores:
        print("canonical checkpoint was not scored (load/score failure); "
              "refusing to promote — fix canonical scoring first")
        print(json.dumps({"scores": scores, "best": None}))
        return
    best = max(scores, key=scores.get)
    print(json.dumps({"scores": scores, "best": best}))
    if best != "canonical":
        src = cands[best]
        print(f"promoting {src} -> {CANON}")
        os.makedirs(CANON, exist_ok=True)
        shutil.copy(os.path.join(src, "latest.npz"),
                    os.path.join(CANON, "latest.npz"))
        j = os.path.join(src, "latest.json")
        if os.path.exists(j):
            shutil.copy(j, os.path.join(CANON, "latest.json"))
    with open("/tmp/post_r5/select_scores.json", "w") as f:
        json.dump({"scores": scores, "best": best}, f, indent=1)


if __name__ == "__main__":
    main()
