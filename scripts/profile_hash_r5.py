#!/usr/bin/env python
"""Round-5 hash train-step profile (post-slotpack): where do the 121 ms go?

After the slotpack backward removed the scatter bottleneck (311 -> 121
ms/step), the remaining distribution is unprofiled. Captures a
jax.profiler trace of the scanned cellpack train step; summarize offline
with scripts/trace_summary.py /tmp/jaxprof/hash_r5 20 (no jax import).

Run standalone on the TPU:  python scripts/profile_hash_r5.py
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
    from nerf_tpu.train.loop import init_nerf_params
    from nerf_tpu.train.optim import make_optimizer
    from nerf_tpu.train.state import init_state, train_steps

    print("backend:", jax.default_backend(), flush=True)
    n_rays, chunk = 1024, 8
    H = W = 128
    rng = np.random.RandomState(0)
    images_u8 = jnp.asarray(rng.randint(0, 256, (4, H, W, 3), np.uint8))
    poses = jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * 4))
    K = jnp.asarray([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]],
                    jnp.float32)

    cfg = load_cfg("configs/nerf/lego_hashgrid_cellpack.yaml")
    tx = make_optimizer(cfg)
    opts = RenderOptions.from_cfg(cfg)
    params = init_nerf_params(jax.random.PRNGKey(0), opts)
    state = init_state(params, tx)

    # compile + warm
    state, stats = train_steps(state, images_u8, poses, K,
                               jax.random.PRNGKey(1), tx, opts, n_rays, chunk)
    np.asarray(stats["loss"])
    t0 = time.time()
    state, stats = train_steps(state, images_u8, poses, K,
                               jax.random.PRNGKey(2), tx, opts, n_rays, chunk)
    np.asarray(stats["loss"])
    print(f"warm chunk: {(time.time()-t0)/chunk*1e3:.1f} ms/step", flush=True)

    with jax.profiler.trace("/tmp/jaxprof/hash_r5"):
        state, stats = train_steps(state, images_u8, poses, K,
                                   jax.random.PRNGKey(3), tx, opts, n_rays,
                                   chunk)
        np.asarray(stats["loss"])
    print("trace -> /tmp/jaxprof/hash_r5", flush=True)


if __name__ == "__main__":
    main()
