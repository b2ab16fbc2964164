#!/usr/bin/env python
"""Marched fast-inference path: recover-or-close sweep (VERDICT r3 #7).

Target: marched >= hierarchical-ESS-off PSNR (~30.6) at >159k rays/s.
New lever this round: per-ray occupied-span refocusing (render_rays_marched
``refocus``). Sweep {refocus} x {total samples} x {ert_threshold} x
{compaction} on test frames with the trained checkpoint, one process.

    python scripts/marched_sweep_r4.py [--frames N]
Writes /tmp/marched_sweep_r4.json.
"""
import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

DATA = "/root/reference/data/nerf_synthetic"


def main():
    import jax
    import jax.numpy as jnp

    from nerf_tpu.config import make_cfg
    from nerf_tpu.data.blender import make_dataset
    from nerf_tpu.eval.metrics import psnr as psnr_fn
    from nerf_tpu.render import occupancy as occ
    from nerf_tpu.render.marched import render_image_marched
    from nerf_tpu.render.renderer import RenderOptions, render_image
    from nerf_tpu.train.loop import make_density_fn
    from run import _load_eval_params

    n_frames = 3
    for i, a in enumerate(sys.argv):
        if a == "--frames" and i + 1 < len(sys.argv):
            n_frames = int(sys.argv[i + 1])

    cfg = make_cfg("configs/nerf/lego.yaml", [
        "train_dataset.data_root", DATA, "test_dataset.data_root", DATA])
    base = RenderOptions.from_cfg(cfg)
    params = _load_eval_params(cfg, base)
    ds = make_dataset(cfg, "test")
    K = jnp.asarray(ds.K)
    grid = occ.populate_from_density(
        occ.init_grid(jax.random.PRNGKey(1)),
        make_density_fn(params["coarse"], base))

    frames = [i * (len(ds) // n_frames) for i in range(n_frames)]

    def run(label, fn):
        # compile on frame 0, then timed pass over the frames
        out = fn(jnp.asarray(ds.poses[frames[0]]), jax.random.PRNGKey(0))
        np.asarray(out["rgb_map"])
        psnrs, t0 = [], time.time()
        for fi in frames:
            out = fn(jnp.asarray(ds.poses[fi]), jax.random.PRNGKey(fi))
            pred = np.clip(np.asarray(out["rgb_map"], np.float32), 0, 1)
            psnrs.append(float(psnr_fn(pred, ds.images[fi])))
        dt = (time.time() - t0) / len(frames)
        rec = {"psnr": round(float(np.mean(psnrs)), 3),
               "s_frame": round(dt, 3),
               "rays_s": round(ds.H * ds.W / dt, 0)}
        print(f"{label:42s} PSNR {rec['psnr']:6.2f}  {rec['s_frame']:6.2f}"
              f" s/frame  {rec['rays_s']:9,.0f} rays/s", flush=True)
        return rec

    results = {}
    # hierarchical references
    for label, kw in (("hier_ess_ert_on", {}),
                      ("hier_off", dict(enable_ess=False, enable_ert=False))):
        o = dataclasses.replace(base, **kw)
        g = grid if o.enable_ess else None
        results[label] = run(label, lambda pose, k, o=o, g=g: render_image(
            params, pose, K, k, ds.H, ds.W, o, grid=g))

    # marched variants
    for refocus in (True, False):
        for blocks, bs in ((16, 16), (24, 16), (32, 16)):
            for ert in (0.01, 0.05):
                for compact in (0.0, 0.35):
                    if not refocus and (blocks, bs, ert, compact) != (
                            16, 16, 0.01, 0.35):
                        continue  # only the round-3 shipped point as control
                    label = (f"march_rf{int(refocus)}_s{blocks*bs}"
                             f"_ert{ert}_c{compact}")
                    o = dataclasses.replace(base, ert_threshold=ert,
                                            ess_compaction=compact)
                    results[label] = run(
                        label,
                        lambda pose, k, o=o, nb=blocks, K2=bs, rf=refocus:
                        render_image_marched(params, pose, K, k, ds.H, ds.W,
                                             o, grid=grid, n_blocks=nb,
                                             block_samples=K2, refocus=rf))
    with open("/tmp/marched_sweep_r4.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
