#!/usr/bin/env python
"""Measure hash-encoder train-step throughput: corner vs cellpack layout.

One process, both configs (the relay's compile service is erratic — never
pay process startup twice). For each layout: init params, run the real
train_steps path on synthetic rays, report sustained train rays/s.

Run standalone on the TPU (no other TPU process!):
    python scripts/hashgrid_layout_bench.py [--rays N] [--iters N]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from nerf_tpu.config import load_cfg
    from nerf_tpu.render.renderer import RenderOptions
    from nerf_tpu.train.loop import init_nerf_params, make_train_mesh
    from nerf_tpu.train.optim import make_optimizer
    from nerf_tpu.train.state import init_state, train_steps

    n_rays = 1024
    iters = 3  # scans of `chunk` steps each
    chunk = 8  # matches lego_hashgrid.yaml scan_chunk (relay exec limit)
    for i, a in enumerate(sys.argv):
        if a == "--rays" and i + 1 < len(sys.argv):
            n_rays = int(sys.argv[i + 1])
        if a == "--iters" and i + 1 < len(sys.argv):
            iters = int(sys.argv[i + 1])

    print("backend:", jax.default_backend())

    # synthetic "dataset": 4 tiny images is enough for sample_ray_batch
    H = W = 128
    rng = np.random.RandomState(0)
    images_u8 = jnp.asarray(rng.randint(0, 256, (4, H, W, 3), np.uint8))
    poses = jnp.asarray(
        np.stack([np.eye(4, dtype=np.float32)] * 4), jnp.float32)
    K = jnp.asarray([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]],
                    jnp.float32)

    cfg = load_cfg("configs/nerf/lego_hashgrid.yaml")
    cfg.task_arg.N_rays = n_rays
    mesh = make_train_mesh(cfg, n_rays)
    tx = make_optimizer(cfg)

    results = {}
    import dataclasses

    for layout in ("corner", "cellpack"):
        opts = dataclasses.replace(RenderOptions.from_cfg(cfg),
                                   hash_layout=layout)
        params = init_nerf_params(jax.random.PRNGKey(0), opts)
        state = init_state(params, tx)
        key = jax.random.PRNGKey(1)

        t0 = time.time()
        state, stats = train_steps(state, images_u8, poses, K, key, tx,
                                   opts, n_rays, chunk, mesh=mesh)
        jax.block_until_ready(state.params)
        t_compile = time.time() - t0
        t0 = time.time()
        for i in range(iters):
            state, stats = train_steps(
                state, images_u8, poses, K, jax.random.fold_in(key, i), tx,
                opts, n_rays, chunk, mesh=mesh)
        jax.block_until_ready(state.params)
        dt = (time.time() - t0) / (iters * chunk)
        rps = n_rays / dt
        results[layout] = rps
        print(f"{layout:9s}: {dt*1e3:8.1f} ms/step  {rps:10,.0f} train rays/s"
              f"  (compile+first-chunk {t_compile:.1f}s)  "
              f"loss {float(stats['loss']):.4f}")

    if "corner" in results and results["corner"] > 0:
        print(f"cellpack speedup: {results['cellpack']/results['corner']:.2f}x")


if __name__ == "__main__" and "--fwd" not in sys.argv:
    main()


def fwd_only():
    """Eval-path A/B: render_rays forward (no grad) for both layouts."""
    import dataclasses
    import jax
    import jax.numpy as jnp

    from nerf_tpu.config import load_cfg
    from nerf_tpu.render.renderer import RenderOptions, render_rays
    from nerf_tpu.train.loop import init_nerf_params

    print("backend:", jax.default_backend())
    cfg = load_cfg("configs/nerf/lego_hashgrid.yaml")
    n = 1024  # matches the hashgrid render tile (render_tile_rays)
    theta = jnp.linspace(0, 1, n)
    rays_o = jnp.zeros((n, 3))
    rays_d = jnp.stack(
        [0.4 * theta - 0.2, 0.2 - 0.4 * theta, -jnp.ones_like(theta)], -1)

    for layout in ("corner", "cellpack"):
        opts = dataclasses.replace(RenderOptions.from_cfg(cfg),
                                   hash_layout=layout, tile_rays=n)
        params = init_nerf_params(jax.random.PRNGKey(0), opts)
        fwd = jax.jit(lambda p, k, o=opts: render_rays(
            p, rays_o, rays_d, k, o, train=False)["rgb_map"])
        t0 = time.time()
        np.asarray(fwd(params, jax.random.PRNGKey(99)))
        t_compile = time.time() - t0
        iters = 6
        t0 = time.time()
        for i in range(iters):
            out = fwd(params, jax.random.PRNGKey(i))
        np.asarray(out)
        dt = (time.time() - t0) / iters
        print(f"{layout:9s} eval: {dt*1e3:8.1f} ms/tile  "
              f"{n/dt:10,.0f} fwd rays/s  (compile {t_compile:.1f}s)")


if __name__ == "__main__" and "--fwd" in sys.argv:
    fwd_only()
    sys.exit(0)
