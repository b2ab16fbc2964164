#!/usr/bin/env python
"""Round-5 hash batch-size probe: pick the cellpack main-run configuration.

The cellpack train step is gather-latency bound (docs/PERF.md "Hash-encoder
path"); larger ray batches amortize the per-call gather/scatter overhead, so
rays/s should rise superlinearly-in-usefulness with batch size. This times
the REAL scanned train step (train/state.py::train_steps, the exact
train/loop.py path) for cellpack at N_rays in {1024, 2048, 4096} and prints
rays/s per config, so the round-5 120-epoch run (VERDICT r4 #1) commits to
the measured winner instead of the default 1024.

Run standalone on the TPU (no other TPU process!):
    python scripts/hash_batch_probe_r5.py [--iters N]
Writes /tmp/hash_batch_probe_r5.json.
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

    from nerf_tpu.config import load_cfg
    from nerf_tpu.render.renderer import RenderOptions
    from nerf_tpu.train.loop import init_nerf_params
    from nerf_tpu.train.optim import make_optimizer
    from nerf_tpu.train.state import init_state, train_steps

    iters = 3
    batches = (1024, 2048, 4096)
    for i, a in enumerate(sys.argv):
        if a == "--iters" and i + 1 < len(sys.argv):
            iters = int(sys.argv[i + 1])
        if a == "--batches" and i + 1 < len(sys.argv):
            batches = tuple(int(b) for b in sys.argv[i + 1].split(","))

    print("backend:", jax.default_backend(), flush=True)
    chunk = 8
    H = W = 128
    rng = np.random.RandomState(0)
    images_u8 = jnp.asarray(rng.randint(0, 256, (4, H, W, 3), np.uint8))
    poses = jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * 4))
    K = jnp.asarray([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]],
                    jnp.float32)

    cfg = load_cfg("configs/nerf/lego_hashgrid_cellpack.yaml")
    tx = make_optimizer(cfg)
    base = RenderOptions.from_cfg(cfg)

    results = {}
    for n_rays in batches:
        opts = dataclasses.replace(base)
        params = init_nerf_params(jax.random.PRNGKey(0), opts)
        state = init_state(params, tx)
        key = jax.random.PRNGKey(1)
        try:
            t0 = time.time()
            state, stats = train_steps(state, images_u8, poses, K, key, tx,
                                       opts, n_rays, chunk)
            np.asarray(stats["loss"])
            t_compile = time.time() - t0
            t0 = time.time()
            for i in range(iters):
                k = jax.random.fold_in(key, i)
                state, stats = train_steps(state, images_u8, poses, K, k, tx,
                                           opts, n_rays, chunk)
            np.asarray(stats["loss"])
            dt = (time.time() - t0) / (iters * chunk)
            rps = n_rays / dt
            results[str(n_rays)] = {
                "ms_per_step": round(dt * 1e3, 1),
                "rays_per_s": round(rps, 0),
                "compile_s": round(t_compile, 1),
                "loss": float(stats["loss"]),
            }
            print(f"cellpack N_rays={n_rays:5d}: {dt*1e3:8.1f} ms/step  "
                  f"{rps:9,.0f} rays/s  (compile {t_compile:.1f}s)  "
                  f"loss {float(stats['loss']):.4f}", flush=True)
        except Exception as e:
            results[str(n_rays)] = {"error": f"{type(e).__name__}: "
                                    f"{str(e)[:300]}"}
            print(f"cellpack N_rays={n_rays:5d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)

    with open("/tmp/hash_batch_probe_r5.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
