#!/usr/bin/env python
"""Benchmark: rays/s/chip on lego 800x800, forward AND train step (the
north-star metric, BASELINE.json: "rays/s/chip (fwd + train step)").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus the
train-step numbers as extra keys ({"train_rays_per_s", "train_vs_baseline"}).

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is the
ratio against this framework's round-1 paths measured on the same v5e chip:
forward = the pure-XLA hierarchical render (44,110 rays/s), train = the
round-1 sustained training throughput (26,200 rays/s over the 600-epoch
lego run, EVAL_r1/README.md).
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
# round-1 sustained train throughput on the same chip (600-epoch lego run)
TRAIN_BASELINE_RAYS_PER_S = 26200.0

LEGO_ROOT = "/root/reference/data/nerf_synthetic"


def bench_train(params, images_u8, poses, K, opts, grid, n_rays: int,
                n_steps: int = 50, n_reps: int = 3):
    """Train-step rays/s: median over ``n_reps`` independently-timed
    compiled scan chunks of ``n_steps`` steps each, after a warmup chunk
    (same code path as train/loop.py). Fresh PRNG key per rep so the relay
    can't serve a cached result. Returns (median, reps)."""
    import jax
    import jax.numpy as jnp

    from nerf_tpu.config import default_cfg
    from nerf_tpu.train.optim import make_optimizer
    from nerf_tpu.train.state import init_state, train_steps

    tx = make_optimizer(default_cfg())
    state = init_state(params, tx)
    key = jax.random.PRNGKey(0)
    state, stats = train_steps(  # compile + warmup
        state, images_u8, poses, K, key, tx, opts, n_rays, n_steps, grid=grid)
    np.asarray(stats["loss"])
    reps = []
    for i in range(n_reps):
        k = jax.random.fold_in(key, i + 1)
        t0 = time.time()
        state, stats = train_steps(
            state, images_u8, poses, K, k, tx, opts, n_rays, n_steps,
            grid=grid)
        np.asarray(stats["loss"])  # host transfer = honest sync
        reps.append(n_steps * n_rays / (time.time() - t0))
    assert np.isfinite(float(stats["loss"]))
    return float(np.median(reps)), reps


def wait_for_tpu():
    """Cooperatively take the chip: ONE TPU process at a time (CLAUDE.md) —
    signal a running training stretch to stop (scripts/train_watchdog.sh
    honors /tmp/stop_training within ~60 s) and wait for it to exit before
    importing anything that touches the relay. The signal file is always
    removed afterwards so a later watchdog launch isn't killed by a stale
    stop request."""
    import subprocess

    try:
        open("/tmp/stop_training", "w").close()
    except OSError:
        return
    try:
        for _ in range(120):  # up to 10 min
            r = subprocess.run(["pgrep", "-f", "train.py --cfg_file"],
                               capture_output=True)
            if r.returncode != 0:
                return
            time.sleep(5)
    finally:
        try:
            os.remove("/tmp/stop_training")
        except OSError:
            pass
    # Still running after the timeout: starting a second TPU process wedges
    # BOTH (futex deadlock, CLAUDE.md). Refuse rather than proceed.
    sys.exit("bench.py: training still running after 10 min wait; "
             "refusing to start a second TPU process")


def main():
    wait_for_tpu()
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
    if "--f32" in sys.argv:
        kwargs["compute_dtype"] = "float32"
    for i, a in enumerate(sys.argv):
        if a == "--compaction" and i + 1 < len(sys.argv):
            v = sys.argv[i + 1]
            # "auto" = capacity-aware calibration per checkpoint (resolved
            # below once params+grid exist)
            kwargs["ess_compaction"] = -1.0 if v == "auto" else float(v)
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

    if opts.ess_compaction < 0.0:  # --compaction auto
        from nerf_tpu.render.rays import image_rays
        from nerf_tpu.render.renderer import resolve_compaction

        ro, rd = image_rays(H, W, K, pose)
        mid = (H * W) // 2
        opts = resolve_compaction(opts, params, grid,
                                  ro[mid - 2048:mid + 2048],
                                  rd[mid - 2048:mid + 2048])

    # warmup (compile)
    out = render_image(params, pose, K, jax.random.PRNGKey(0), H, W, opts,
                       grid=grid)
    np.asarray(out["rgb_map"])  # force through the device queue

    # Relay-robust protocol (round-5): the tunnel's per-call latency drifts
    # by 10-20% between runs (BENCH_r04 146.3k vs the builder's same-day
    # 172.7k on identical code), so one averaged rep is hostage to tunnel
    # state. Take the MEDIAN of n_reps independently-timed reps (warmup
    # excluded, fresh PRNG key per rep so the relay can't serve a cached
    # result), publish the per-rep values, and warn when the spread says
    # the tunnel was degraded. Mirrors the reference's drop-first-average
    # protocol (/root/reference/run.py:87-93) hardened for a noisy link.
    n_reps = 5
    for i, a in enumerate(sys.argv):
        if a == "--reps" and i + 1 < len(sys.argv):
            n_reps = int(sys.argv[i + 1])
    reps = []
    for i in range(n_reps):
        t0 = time.time()
        out = render_image(params, pose, K, jax.random.PRNGKey(i + 1), H, W,
                           opts, grid=grid)
        np.asarray(out["rgb_map"])  # host transfer = honest sync
        reps.append(H * W / (time.time() - t0))
    rays_per_s = float(np.median(reps))
    spread = (max(reps) - min(reps)) / rays_per_s
    if spread > 0.10:
        print(f"# WARNING: fwd rep spread {spread:.0%} (>10%) — relay "
              f"latency unstable; median reported, reps in JSON",
              file=sys.stderr)

    # train-step throughput (same chip, same model, 1024-ray batches like
    # configs/nerf/lego.yaml; --no-train skips it)
    record = {
        "metric": "lego_800x800_fwd_rays_per_s_per_chip",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / XLA_BASELINE_RAYS_PER_S, 3),
        "reps": [round(r, 1) for r in reps],
        "rep_spread": round(spread, 3),
    }
    if "--no-train" not in sys.argv:
        n_rays = 1024
        for i, a in enumerate(sys.argv):
            if a == "--train-rays" and i + 1 < len(sys.argv):
                n_rays = int(sys.argv[i + 1])
        try:
            from nerf_tpu.data.blender import BlenderDataset

            tds = BlenderDataset(LEGO_ROOT, split="train", scene="lego",
                                 cams=[0, 8, 1], H=H, W=W)
            images_u8 = jnp.asarray(
                np.round(tds.images * 255).astype(np.uint8))
            tposes = jnp.asarray(tds.poses)
        except Exception:
            rng = np.random.RandomState(0)
            images_u8 = jnp.asarray(
                rng.randint(0, 256, (2, H, W, 3), np.uint8))
            tposes = jnp.broadcast_to(jnp.eye(4).at[2, 3].set(4.0), (2, 4, 4))
        # The headline train number must measure the REAL training path:
        # configs/nerf/lego.yaml sets use_pallas_kernels True (fused Pallas
        # MLP pair); use_pallas_integrate now defaults ON everywhere (round-4
        # best-known-defaults change) — mirror the trainer here regardless
        # of the forward-bench flags (round-2 verdict: the XLA default
        # under-reported the trainer by ~20%).
        train_kwargs = dict(kwargs)
        train_kwargs["use_pallas"] = True
        train_kwargs["use_pallas_integrate"] = (
            "--no-pallas-integrate" not in sys.argv)
        if "--train-xla" in sys.argv:  # opt-in: bench the XLA train path
            train_kwargs["use_pallas"] = False
        train_opts = RenderOptions(**train_kwargs)
        train_rps, train_reps = bench_train(params, images_u8, tposes, K,
                                            train_opts, grid, n_rays)
        t_spread = (max(train_reps) - min(train_reps)) / train_rps
        if t_spread > 0.10:
            print(f"# WARNING: train rep spread {t_spread:.0%} (>10%) — "
                  f"relay latency unstable; median reported",
                  file=sys.stderr)
        record["train_rays_per_s"] = round(train_rps, 1)
        record["train_vs_baseline"] = round(
            train_rps / TRAIN_BASELINE_RAYS_PER_S, 3)
        record["train_reps"] = [round(r, 1) for r in train_reps]
        record["train_rep_spread"] = round(t_spread, 3)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
