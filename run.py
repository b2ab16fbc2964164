#!/usr/bin/env python
"""Runner CLI: smoke tests + full evaluation.

Parity surface: reference ``run.py`` — dispatches ``run_<type>`` by
``--type``: dataset (loader smoke), network (renderer timing), evaluate
(full test-set eval: metrics, fps, optional spiral video).
"""
import sys
import time

from nerf_tpu.utils.profiling import RaysPerSecond


def run_dataset(cfg):
    from nerf_tpu.data.blender import make_dataset

    ds = make_dataset(cfg, "train")
    t0 = time.time()
    for i in range(len(ds)):
        _ = ds[i]
    print(f"dataset ok: {len(ds)} items in {time.time() - t0:.2f}s "
          f"({ds.H}x{ds.W}, focal {ds.focal:.2f})")


def _load_eval_params(cfg, opts):
    import jax

    from nerf_tpu.train.checkpoint import load_checkpoint
    from nerf_tpu.train.loop import init_nerf_params
    from nerf_tpu.train.optim import make_optimizer
    from nerf_tpu.train.state import init_state

    if cfg.get("network_module", "nerf") == "kilonerf":
        # distilled voxel-routed model (distill_kilonerf.py writes
        # <trained_model_dir>/kilonerf with a plain-adam TrainState)
        import os
        import optax

        from nerf_tpu.ops.kilonerf import init_kilonerf
        from nerf_tpu.render.renderer import kilo_config_from_opts
        from nerf_tpu.train.state import TrainState

        import jax.numpy as jnp

        p = init_kilonerf(jax.random.PRNGKey(0), kilo_config_from_opts(opts))
        tx = optax.adam(1e-3)
        template = TrainState(params=p, opt_state=tx.init(p),
                              step=jnp.asarray(0))
        kilo_dir = os.path.join(cfg.trained_model_dir, "kilonerf")
        ckpt = load_checkpoint(kilo_dir, template)
        if ckpt is None:
            print(f"WARNING: no kilonerf checkpoint in {kilo_dir}; "
                  "using random weights")
            return {"coarse": p, "fine": p}
        return {"coarse": ckpt[0].params, "fine": ckpt[0].params}

    params = init_nerf_params(jax.random.PRNGKey(0), opts)
    template = init_state(params, make_optimizer(cfg))
    ckpt = load_checkpoint(cfg.trained_model_dir, template)
    if ckpt is None:
        print(f"WARNING: no checkpoint in {cfg.trained_model_dir}; "
              "using random weights")
        return params
    return ckpt[0].params


def run_network(cfg):
    """Renderer timing over test batches (reference run.py:17-42)."""
    import jax
    import jax.numpy as jnp

    from nerf_tpu.data.blender import make_dataset
    from nerf_tpu.render.renderer import RenderOptions, render_image
    from nerf_tpu.render import occupancy as occ

    opts = RenderOptions.from_cfg(cfg)
    params = _load_eval_params(cfg, opts)
    grid = (occ.init_grid(jax.random.PRNGKey(1),
                          int(cfg.get("occupancy_grid_resolution", 128)))
            if opts.enable_ess else None)
    ds = make_dataset(cfg, "test")
    K = jnp.asarray(ds.K)
    meter = RaysPerSecond(drop_first=1)  # reference protocol: drop frame 0
    for i in range(min(5, len(ds))):
        with meter.measure(ds.H * ds.W) as done:
            out = render_image(params, jnp.asarray(ds.poses[i]), K,
                               jax.random.PRNGKey(i), ds.H, ds.W, opts,
                               grid=grid)
            done(out)  # honest sync: forces a host transfer
        print(f"frame {i}: {meter.samples[-1][1]:.3f}s")
    s = meter.summary()
    if s["frames"]:
        print(f"mean render time {s['mean_time_s']:.3f}s, fps {s['fps']:.2f}, "
              f"{s['rays_per_s']:,.0f} rays/s")


def run_marched(cfg):
    """Fast-inference timing: blockwise marched renderer vs hierarchical."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerf_tpu.data.blender import make_dataset
    from nerf_tpu.render import occupancy as occ
    from nerf_tpu.render.marched import render_image_marched
    from nerf_tpu.render.renderer import RenderOptions, render_image
    from nerf_tpu.train.loop import make_density_fn
    from nerf_tpu.eval.metrics import psnr as psnr_fn

    opts = RenderOptions.from_cfg(cfg)
    params = _load_eval_params(cfg, opts)
    grid = occ.populate_from_density(
        occ.init_grid(jax.random.PRNGKey(1),
                      int(cfg.get("occupancy_grid_resolution", 128))),
        make_density_fn(params["coarse"], opts))
    ds = make_dataset(cfg, "test")
    K = jnp.asarray(ds.K)
    pose = jnp.asarray(ds.poses[0])
    n_blocks = int(cfg.get("march_blocks", 16))
    block_samples = int(cfg.get("march_block_samples", 16))

    for name, fn in (
        ("hierarchical", lambda k: render_image(
            params, pose, K, k, ds.H, ds.W, opts, grid=grid)),
        ("marched", lambda k: render_image_marched(
            params, pose, K, k, ds.H, ds.W, opts, grid=grid,
            n_blocks=n_blocks, block_samples=block_samples)),
    ):
        out = fn(jax.random.PRNGKey(0))
        np.asarray(out["rgb_map"])  # compile+sync
        t0 = time.time()
        out = fn(jax.random.PRNGKey(1))
        pred = np.clip(np.asarray(out["rgb_map"]), 0, 1)
        dt = time.time() - t0
        p = psnr_fn(pred, ds.images[0])
        print(f"{name:>12}: {dt:6.2f}s/frame  {ds.H * ds.W / dt:>9,.0f} rays/s"
              f"  psnr {p:.2f}")


def run_evaluate(cfg):
    """Full eval: PSNR/SSIM/MSE + fps + optional video (reference run.py:45)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerf_tpu.data.blender import make_dataset
    from nerf_tpu.eval.evaluator import Evaluator
    from nerf_tpu.render.renderer import RenderOptions, render_image
    from nerf_tpu.render import occupancy as occ

    if cfg.task == "img_fit":
        from nerf_tpu.train.img_fit_loop import eval_img_fit

        return eval_img_fit(cfg)

    opts = RenderOptions.from_cfg(cfg)
    params = _load_eval_params(cfg, opts)
    grid = None
    if opts.enable_ess:
        # grid from the trained density (KiloNeRF rebuild) for honest ESS
        from nerf_tpu.train.loop import make_density_fn
        import jax.random as jrandom

        grid = occ.populate_from_density(
            occ.init_grid(jrandom.PRNGKey(1),
                          int(cfg.get("occupancy_grid_resolution", 128))),
            make_density_fn(params["coarse"], opts),
        )

    ds = make_dataset(cfg, "test")
    evaluator = Evaluator(
        cfg.result_dir,
        background_strategy=cfg.get("background_strategy", "none"),
    )
    K = jnp.asarray(ds.K)
    if opts.ess_compaction < 0.0:  # "auto": calibrate per checkpoint
        from nerf_tpu.render.rays import image_rays
        from nerf_tpu.render.renderer import resolve_compaction

        ro, rd = image_rays(ds.H, ds.W, K, jnp.asarray(ds.poses[0]))
        mid = (ds.H * ds.W) // 2
        opts = resolve_compaction(
            opts, params, grid,
            ro[mid - 2048:mid + 2048], rd[mid - 2048:mid + 2048])
    meter = RaysPerSecond(drop_first=1)
    for i in range(len(ds)):
        with meter.measure(ds.H * ds.W):
            out = render_image(params, jnp.asarray(ds.poses[i]), K,
                               jax.random.PRNGKey(i), ds.H, ds.W, opts,
                               grid=grid)
            # the host transfer of pred is the honest sync point
            pred = np.asarray(out.get("rgb_map", out["rgb_map_0"]))
        evaluator.evaluate(pred, ds.images[i], i)
    summary = evaluator.summarize()
    s = meter.summary()
    if s["frames"]:
        print(f"mean net_time: {s['mean_time_s']:.3f}s  fps: {s['fps']:.2f}  "
              f"rays/s: {s['rays_per_s']:,.0f}")

    if cfg.get("write_video", False):
        from nerf_tpu.eval.video import render_novel_view_sequence
        from nerf_tpu.render.spiral import generate_spiral_poses

        if cfg.get("render_type", "spiral") == "spiral":
            poses = generate_spiral_poses(ds.poses, int(cfg.get("render_num", 120)))
        else:
            poses = ds.poses[: int(cfg.get("render_num", 120))]

        def render_fn(pose):
            out = render_image(params, jnp.asarray(pose), K,
                               jax.random.PRNGKey(0), ds.H, ds.W, opts, grid=grid)
            return {"rgb_map": out.get("rgb_map", out["rgb_map_0"]),
                    "disp_map": out.get("disp_map", out["disp_map_0"])}

        render_novel_view_sequence(
            render_fn, poses, ds.H, ds.W, cfg.result_dir,
            fps=int(cfg.get("fps", 24)),
        )
    return summary


def main(argv=None):
    from nerf_tpu.config import parse_args

    cfg, args = parse_args(argv)
    run_fn = globals().get(f"run_{args.type}")
    if run_fn is None:
        print(f"unknown --type {args.type!r}; "
              "available: dataset, network, marched, evaluate")
        sys.exit(1)
    run_fn(cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
