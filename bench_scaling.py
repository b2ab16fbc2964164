#!/usr/bin/env python
"""Rays/s scaling-efficiency harness over a device mesh.

North-star protocol (BASELINE.md): rays/s at 1 chip / 1 host / N hosts with
>=85% efficiency at 2 hosts. On this box only one real chip exists, so by
default this runs on N virtual CPU devices to validate the sharded step and
measure *relative* scaling of the compiled program; on a pod slice the same
code measures real chips (pass --platform tpu).

Usage:
    python bench_scaling.py [--devices 8] [--rays-per-device 2048]
        [--steps 10] [--platform cpu|tpu]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--devices", type=int, default=8)
    parser.add_argument("--rays-per-device", type=int, default=2048)
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    args = parser.parse_args(argv)

    if args.platform == "cpu":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import jax.numpy as jnp
    import numpy as np

    from nerf_tpu.config import default_cfg
    from nerf_tpu.parallel.mesh import make_mesh, replicate
    from nerf_tpu.parallel.train_step import make_sharded_train_step
    from nerf_tpu.render.renderer import RenderOptions
    from nerf_tpu.train.loop import init_nerf_params
    from nerf_tpu.train.optim import make_optimizer
    from nerf_tpu.train.state import init_state

    n_avail = len(jax.devices())
    opts = RenderOptions(
        n_samples=8, n_importance=16, compute_dtype="float32",
        enable_ess=False, enable_ert=True, use_pallas=(args.platform == "tpu"),
    )
    cfg = default_cfg()
    tx = make_optimizer(cfg)

    rng = np.random.RandomState(0)
    n_imgs, H, W = 4, 64, 64
    images_u8_np = rng.randint(0, 256, (n_imgs, H, W, 3), np.uint8)
    poses_np = np.broadcast_to(np.eye(4, dtype=np.float32), (n_imgs, 4, 4))
    K_np = np.array([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]], np.float32)

    results = {}
    sizes = [d for d in (1, 2, n_avail) if d <= n_avail]
    for nd in sorted(set(sizes)):
        mesh = make_mesh(nd)
        params = init_nerf_params(jax.random.PRNGKey(0), opts)
        state = replicate(mesh, init_state(params, tx))
        images = replicate(mesh, jnp.asarray(images_u8_np))
        poses = replicate(mesh, jnp.asarray(poses_np))
        K = replicate(mesh, jnp.asarray(K_np))
        n_rays = args.rays_per_device * nd
        step = make_sharded_train_step(mesh, tx, opts, n_rays)
        state, stats = step(state, images, poses, K, jax.random.PRNGKey(0), None)
        np.asarray(stats["loss"])  # compile + sync
        t0 = time.time()
        for i in range(args.steps):
            state, stats = step(state, images, poses, K,
                                jax.random.PRNGKey(i + 1), None)
        np.asarray(stats["loss"])
        dt = (time.time() - t0) / args.steps
        rays_per_s = n_rays / dt
        results[nd] = rays_per_s
        base = results[min(results)]
        eff = rays_per_s / (base * nd / min(results))
        print(f"devices={nd:2d}  global_batch={n_rays:6d}  "
              f"{rays_per_s:12,.0f} rays/s  efficiency={eff * 100:6.1f}%")

    base_nd = min(results)
    report = {
        "platform": args.platform,
        "rays_per_device": args.rays_per_device,
        "results": {str(k): v for k, v in results.items()},
        "efficiency": {
            str(k): results[k] / (results[base_nd] * k / base_nd)
            for k in results
        },
    }
    if args.platform == "cpu":
        report["note"] = (
            "virtual CPU devices share ONE physical CPU: weak-scaling "
            "throughput cannot grow, so 'efficiency' here only validates "
            "that the sharded program compiles/runs at every mesh size. "
            "Real ICI efficiency requires a multi-chip slice "
            "(--platform tpu)."
        )
    with open("scaling_results.json", "w") as f:
        json.dump(report, f, indent=2)
    print("written: scaling_results.json")


if __name__ == "__main__":
    main(sys.argv[1:])
