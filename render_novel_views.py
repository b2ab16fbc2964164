#!/usr/bin/env python
"""Novel-view rendering CLI: spiral or original camera path to images + mp4.

Parity surface: reference ``render_novel_views.py`` (which is broken at
:35 — calls a nonexistent cfg.from_file; this implements the intended
behavior, SURVEY.md §7.3).

Usage:
    python render_novel_views.py --cfg_file configs/nerf/lego.yaml \
        [render_type spiral|original] [render_num 120] [fps 24]
"""
from __future__ import annotations

import sys


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from nerf_tpu.config import parse_args
    from nerf_tpu.data.blender import make_dataset
    from nerf_tpu.eval.video import render_novel_view_sequence
    from nerf_tpu.render import occupancy as occ
    from nerf_tpu.render.renderer import RenderOptions, render_image
    from nerf_tpu.render.spiral import generate_spiral_poses
    from nerf_tpu.train.loop import make_density_fn
    from run import _load_eval_params

    cfg, args = parse_args(argv)
    opts = RenderOptions.from_cfg(cfg)
    params = _load_eval_params(cfg, opts)
    ds = make_dataset(cfg, "test")

    grid = None
    if opts.enable_ess:
        grid = occ.populate_from_density(
            occ.init_grid(jax.random.PRNGKey(1),
                          int(cfg.get("occupancy_grid_resolution", 128))),
            make_density_fn(params["coarse"], opts),
        )

    n_frames = int(cfg.get("render_num", 120))
    if cfg.get("render_type", "spiral") == "spiral":
        poses = generate_spiral_poses(ds.poses, n_frames)
        tag = "spiral"
    else:
        poses = ds.poses[:n_frames]
        tag = "original"

    K = jnp.asarray(ds.K)

    def render_fn(pose):
        out = render_image(params, jnp.asarray(pose), K, jax.random.PRNGKey(0),
                           ds.H, ds.W, opts, grid=grid)
        return {"rgb_map": out.get("rgb_map", out["rgb_map_0"]),
                "disp_map": out.get("disp_map", out["disp_map_0"])}

    paths = render_novel_view_sequence(
        render_fn, poses, ds.H, ds.W, cfg.result_dir,
        fps=int(cfg.get("fps", 24)), tag=tag,
    )
    print(f"done: {paths}")


if __name__ == "__main__":
    main(sys.argv[1:])
