#!/usr/bin/env python
"""Benchmark: rays/s/chip on lego 800x800 (the north-star metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is the
ratio against this framework's round-1 pure-XLA path measured on the same
v5e chip (52,519 rays/s full 64+128 hierarchical forward, ESS+ERT on) —
i.e. the kernel-fusion speedup over the unfused baseline.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# round-1 unfused XLA path on the round-1 trained checkpoint (PSNR 28.8),
# measured on this repo's v5e — future rounds report speedup vs this
XLA_BASELINE_RAYS_PER_S = 44109.8

LEGO_ROOT = "/root/reference/data/nerf_synthetic"


def main():
    import jax
    import jax.numpy as jnp

    from nerf_tpu.render.renderer import RenderOptions, render_image
    from nerf_tpu.render import occupancy as occ
    from nerf_tpu.train.loop import init_nerf_params

    H = W = 800
    # Default = the best validated config on this device (full-budget round-1
    # sweep): XLA query path + Pallas integration kernel, ray tile 8192.
    # The fused Pallas MLP ties XLA here (41.9k vs 41.5k) and is the right
    # default on direct-attached v5e (--pallas opts in); the integrate
    # kernel is +9% end-to-end (45.2k) and allclose-validated on TPU
    # (scripts/validate_integrate_tpu.py). --no-pallas-integrate opts out.
    kwargs = {"use_pallas": False, "use_pallas_integrate": True}
    if "--pallas" in sys.argv:
        kwargs["use_pallas"] = True
    if "--no-pallas-integrate" in sys.argv:
        kwargs["use_pallas_integrate"] = False
    for i, a in enumerate(sys.argv):
        if a == "--compaction" and i + 1 < len(sys.argv):
            kwargs["ess_compaction"] = float(sys.argv[i + 1])
        if a == "--tile" and i + 1 < len(sys.argv):
            kwargs["tile_rays"] = int(sys.argv[i + 1])
        if a == "--ktile" and i + 1 < len(sys.argv):
            from nerf_tpu.ops import fused_mlp

            fused_mlp.TILE = int(sys.argv[i + 1])
    opts = RenderOptions(**kwargs)  # lego defaults: 64+128, ESS+ERT, bf16
    params = init_nerf_params(jax.random.PRNGKey(0), opts)

    # use the trained checkpoint when present (honest ESS/ERT behavior)
    ckpt_dir = "workspace/trained_model/nerf/lego/nerf"
    try:
        from nerf_tpu.train.checkpoint import load_params

        loaded = load_params(ckpt_dir, params)
        if loaded is not None:
            params = loaded
            print(f"# using trained checkpoint from {ckpt_dir}",
                  file=sys.stderr)
    except Exception:
        pass

    # camera: lego-like intrinsics; real pose if dataset present
    try:
        from nerf_tpu.data.blender import BlenderDataset

        ds = BlenderDataset(LEGO_ROOT, split="test", scene="lego",
                            cams=[0, 2, 1], H=H, W=W)
        pose = jnp.asarray(ds.poses[0])
        K = jnp.asarray(ds.K)
    except Exception:
        pose = jnp.eye(4).at[2, 3].set(4.0)
        K = jnp.asarray([[1111.1, 0, W / 2], [0, 1111.1, H / 2], [0, 0, 1]],
                        jnp.float32)

    grid = None
    if opts.enable_ess:
        grid = occ.init_grid(jax.random.PRNGKey(1))
        if os.path.exists(os.path.join(ckpt_dir, "latest.npz")):
            from nerf_tpu.train.loop import make_density_fn

            grid = occ.populate_from_density(
                grid, make_density_fn(params["coarse"], opts))

    # warmup (compile)
    out = render_image(params, pose, K, jax.random.PRNGKey(0), H, W, opts,
                       grid=grid)
    np.asarray(out["rgb_map"])  # force through the device queue

    n_iters = 3
    t0 = time.time()
    for i in range(n_iters):
        out = render_image(params, pose, K, jax.random.PRNGKey(i), H, W, opts,
                           grid=grid)
        np.asarray(out["rgb_map"])  # host transfer = honest sync
    dt = (time.time() - t0) / n_iters
    rays_per_s = H * W / dt

    print(json.dumps({
        "metric": "lego_800x800_fwd_rays_per_s_per_chip",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / XLA_BASELINE_RAYS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
