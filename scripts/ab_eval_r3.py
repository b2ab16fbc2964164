#!/usr/bin/env python
"""Round-3 ESS/ERT + sample-budget + dtype ablation, ONE process.

Runs every config variant in a single python process (each variant still
costs one XLA compile, but process startup / dataset load / checkpoint /
occupancy rebuild are paid once — the per-process sequence burned 15 min
per variant when the relay's compile service degraded).

Writes /tmp/post_r3/ab_results.json and prints a table:
  frame time + rays/s (compile excluded), PSNR/SSIM over 10 test frames.
Evidence for round-2 VERDICT #2 (ESS/ERT pay-off at equal quality) and #8
(quality levers: f32 eval of the bf16-trained weights).
"""
import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from nerf_tpu.config import parse_args
    from nerf_tpu.data.blender import make_dataset
    from nerf_tpu.eval.evaluator import Evaluator
    from nerf_tpu.render import occupancy as occ
    from nerf_tpu.render.renderer import RenderOptions, render_image
    from nerf_tpu.train.loop import make_density_fn
    from run import _load_eval_params

    cfg, _ = parse_args()
    base = RenderOptions.from_cfg(cfg)
    params = _load_eval_params(cfg, base)
    ds = make_dataset(cfg, "test")
    K = jnp.asarray(ds.K)
    grid = occ.populate_from_density(
        occ.init_grid(jax.random.PRNGKey(1),
                      int(cfg.get("occupancy_grid_resolution", 128))),
        make_density_fn(params["coarse"], base))

    variants = [
        ("ess_ert_on", {}),
        ("off", dict(enable_ess=False, enable_ert=False)),
        ("ns32_ni96", dict(n_samples=32, n_importance=96)),
        ("ns48_ni96", dict(n_samples=48, n_importance=96)),
        ("ns32_ni128", dict(n_samples=32)),
        ("f32", dict(compute_dtype="float32")),
    ]
    results = {}
    for name, kw in variants:
        opts = dataclasses.replace(base, use_pallas_integrate=True, **kw)
        g = grid if opts.enable_ess else None
        ev = Evaluator(f"/tmp/post_r3/ab_{name}", background_strategy="none")
        times = []
        t_compile0 = time.time()
        for i in range(len(ds)):
            t0 = time.time()
            out = render_image(params, jnp.asarray(ds.poses[i]), K,
                               jax.random.PRNGKey(i), ds.H, ds.W, opts,
                               grid=g)
            pred = np.asarray(out.get("rgb_map", out["rgb_map_0"]))
            times.append(time.time() - t0)
            ev.evaluate(pred, ds.images[i], i)
        s = ev.summarize()
        mean_t = float(np.mean(times[1:]))  # frame 0 carries the compile
        results[name] = {
            "psnr": round(float(s["avg_psnr"]), 3),
            "ssim": round(float(s["avg_ssim"]), 4),
            "s_per_frame": round(mean_t, 3),
            "rays_per_s": round(ds.H * ds.W / mean_t, 1),
            "compile_s": round(times[0] - mean_t, 1),
            "n_frames": len(ds),
        }
        print(f"{name:>12}: PSNR {results[name]['psnr']:.2f}  "
              f"SSIM {results[name]['ssim']:.4f}  "
              f"{mean_t:.2f}s/frame  {results[name]['rays_per_s']:,.0f} rays/s  "
              f"(compile ~{results[name]['compile_s']:.0f}s)", flush=True)

    with open("/tmp/post_r3/ab_results.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
