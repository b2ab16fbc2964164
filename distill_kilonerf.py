#!/usr/bin/env python
"""KiloNeRF distillation CLI: fit the many-small-MLPs model to a trained
NeRF teacher, then render with the voxel-routed networks.

The reference ships the KiloNeRF CUDA kernels (network_eval.cu,
multimatmul.cu) without a training driver; this is the complete workflow:
teacher checkpoint -> distilled kilonerf params -> evaluation render.

Usage:
    python distill_kilonerf.py --cfg_file configs/nerf/lego.yaml \
        test_dataset.data_root ... [kilo.steps 2000] [kilo.grid_size 16]
"""
from __future__ import annotations

import os
import sys
import time


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from nerf_tpu.config import parse_args
    from nerf_tpu.ops.kilonerf import (
        KiloConfig, init_kilonerf, distill_step, query_network_kilonerf,
    )
    from nerf_tpu.render.renderer import RenderOptions, render_image
    from nerf_tpu.train.checkpoint import save_checkpoint
    from nerf_tpu.train.state import TrainState
    from run import _load_eval_params

    cfg, args = parse_args(argv)
    opts = RenderOptions.from_cfg(cfg)
    kilo_node = cfg.get("kilo", {})
    kcfg = KiloConfig(
        grid_size=int(kilo_node.get("grid_size", 16)),
        hidden=int(kilo_node.get("hidden", 32)),
        bbox_min=float(cfg.get("near", 2.0) - 4.0),  # [-2,2] default box
        bbox_max=float(cfg.get("far", 6.0) - 4.0),
    )
    steps = int(kilo_node.get("steps", 2000))
    n_pts = int(kilo_node.get("n_pts", 65536))
    lr = float(kilo_node.get("lr", 1e-3))

    teacher = _load_eval_params(cfg, opts)

    from nerf_tpu.render.renderer import query_network_xla

    def teacher_fn(pts, dirs):
        return query_network_xla(teacher["fine"], pts, dirs, opts)

    # occupancy-weighted sampling: concentrate the fitting budget near the
    # teacher's geometry (uniform box sampling spent ~90% of it on empty
    # space — the round-1 student stalled at 12.95 dB)
    occ_centers = None
    voxel_size = 0.0
    if bool(kilo_node.get("occ_sampling", True)):
        from nerf_tpu.render import occupancy as occ
        from nerf_tpu.train.loop import make_density_fn

        grid = occ.populate_from_density(
            occ.init_grid(jax.random.PRNGKey(1),
                          int(cfg.get("occupancy_grid_resolution", 128))),
            make_density_fn(teacher["coarse"], opts))
        occ_np = np.asarray(grid.occupied)
        res = np.asarray(occ_np.shape)
        lo = np.asarray(grid.bbox_min, np.float64).reshape(3)
        hi = np.asarray(grid.bbox_max, np.float64).reshape(3)
        vsz = (hi - lo) / res  # per-axis (the grid box may be non-cubic)
        voxel_size = float(vsz.max())
        ijk = np.argwhere(occ_np)
        if len(ijk):
            centers = lo + (ijk + 0.5) * vsz
            # drop centers outside the student's box instead of clipping —
            # clipped centers pile samples onto the box faces and distort
            # the occupancy-weighted distribution when near/far differ from
            # the defaults
            inside = np.all((centers >= kcfg.bbox_min)
                            & (centers <= kcfg.bbox_max), axis=1)
            n_drop = int((~inside).sum())
            centers = centers[inside]
            if len(centers):
                occ_centers = jnp.asarray(centers, jnp.float32)
            print(f"occupancy-weighted distill sampling: "
                  f"{len(centers)} voxels ({len(centers) / res.prod():.1%}"
                  f"{f', {n_drop} outside student box dropped' if n_drop else ''})")

    params = init_kilonerf(jax.random.PRNGKey(0), kcfg)
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    t0 = time.time()
    for i in range(steps):
        params, opt_state, loss = distill_step(
            params, opt_state, jax.random.PRNGKey(i), teacher_fn, tx.update,
            kcfg, n_pts=n_pts, occ_centers=occ_centers,
            voxel_size=voxel_size,
            occ_frac=float(kilo_node.get("occ_frac", 0.5)),
        )
        if (i + 1) % max(1, steps // 20) == 0:
            print(f"distill step {i + 1}/{steps}  loss {float(loss):.6f}  "
                  f"({(i + 1) * n_pts / (time.time() - t0):,.0f} pts/s)")

    out_dir = os.path.join(cfg.trained_model_dir, "kilonerf")
    state = TrainState(params=params, opt_state=opt_state,
                       step=jnp.asarray(steps))
    save_checkpoint(out_dir, state, epoch=0)
    print(f"distilled params saved to {out_dir}")

    # quick render comparison teacher vs student
    H = W = int(kilo_node.get("eval_size", 200))
    f = 1.39 * W
    pose = jnp.eye(4).at[2, 3].set(4.0)
    K = jnp.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], jnp.float32)

    # render-path comparison uses multi-round dispatch: ray samples
    # cluster into frustum voxels far past the mean-sized capacity and
    # dropped overflow renders as empty space (the loss path instead
    # sizes capacity explicitly, so it stays single-round)
    kcfg_render = kcfg._replace(
        dispatch_rounds=int(kilo_node.get("dispatch_rounds", 4)))

    def kilo_query(p, pts, viewdirs, o):
        return query_network_kilonerf(p, pts, viewdirs, o, kcfg_render)

    from nerf_tpu.render.renderer import render_rays
    from nerf_tpu.render.rays import image_rays

    rays_o, rays_d = image_rays(H, W, K, pose)

    # chunk the comparison render: one unchunked H*W-ray call makes XLA
    # place the integrate kernel's [N, S] weights output in scoped VMEM,
    # which overflows its 16 MB limit past ~20k rays (observed at 200x200)
    def render_chunked(p, query_fn=None, chunk=4096):
        outs = []
        for s in range(0, rays_o.shape[0], chunk):
            o = render_rays(p, rays_o[s:s + chunk], rays_d[s:s + chunk],
                            jax.random.PRNGKey(0), opts, query_fn=query_fn)
            outs.append(np.asarray(o["rgb_map"], np.float32))
        return np.concatenate(outs, axis=0)

    pt_full = render_chunked(teacher)
    kparams2 = {"coarse": params, "fine": params}
    ps_full = render_chunked(kparams2, query_fn=kilo_query)
    pt = np.clip(pt_full, 0, 1)
    ps = np.clip(ps_full, 0, 1)
    mse = float(np.mean((pt - ps) ** 2))
    psnr = -10 * np.log10(max(mse, 1e-10))
    print(f"student vs teacher render: mse {mse:.6f}  psnr {psnr:.2f} dB")


if __name__ == "__main__":
    main(sys.argv[1:])
