#!/usr/bin/env python
"""Capture jax.profiler traces of one eval tile and one train chunk, and
print honest on-chip vs end-to-end timing + MFU estimates (VERDICT round-1
item 5: separate relay/tunnel overhead from on-chip time).

Writes traces to /tmp/jaxprof/{eval,train} and prints a summary table.
MFU accounting (per ray, lego defaults 64+192 evals of the 8x256 MLP):
  MLP flops/point = 2 * (63*256 + 5*256^2 + (63+256)*256 + 2*256*256
                         + 256 + 283*128 + 128*3)  ~= 1.19 MFLOP
  forward: 256 pts/ray; train step: forward + ~2x backward on 256 pts.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

MLP_FLOPS_PER_POINT = 2 * (63 * 256 + 5 * 256 * 256 + (63 + 256) * 256
                           + 2 * 256 * 256 + 256 + 283 * 128 + 128 * 3)
V5E_BF16_PEAK = 394e12


def main():
    import jax
    import jax.numpy as jnp

    from nerf_tpu.render.renderer import RenderOptions, render_rays
    from nerf_tpu.train.loop import init_nerf_params
    from nerf_tpu.train.optim import make_optimizer
    from nerf_tpu.train.state import init_state, train_steps
    from nerf_tpu.config import default_cfg

    print("backend:", jax.default_backend())
    opts = RenderOptions(use_pallas="--pallas" in sys.argv)
    params = init_nerf_params(jax.random.PRNGKey(0), opts)

    n = 8192
    theta = jnp.linspace(0, 1, n)
    rays_o = jnp.zeros((n, 3))
    rays_d = jnp.stack(
        [0.4 * theta - 0.2, 0.2 - 0.4 * theta, -jnp.ones_like(theta)], -1)

    fwd = jax.jit(lambda p, k: render_rays(p, rays_o, rays_d, k, opts,
                                           train=False)["rgb_map"])
    np.asarray(fwd(params, jax.random.PRNGKey(0)))  # compile

    iters = 8
    t0 = time.time()
    for i in range(iters):
        out = fwd(params, jax.random.PRNGKey(i))
    np.asarray(out)
    dt_fwd = (time.time() - t0) / iters
    pts = n * (opts.n_samples + opts.n_samples + opts.n_importance)
    flops = pts * MLP_FLOPS_PER_POINT
    print(f"eval tile {n} rays: {dt_fwd*1e3:.1f} ms end-to-end  "
          f"{n/dt_fwd:,.0f} rays/s  MFU(e2e) {flops/dt_fwd/V5E_BF16_PEAK*100:.1f}%")

    with jax.profiler.trace("/tmp/jaxprof/eval"):
        for i in range(3):
            out = fwd(params, jax.random.PRNGKey(100 + i))
        np.asarray(out)
    print("eval trace -> /tmp/jaxprof/eval")

    # train chunk
    cfg = default_cfg()
    tx = make_optimizer(cfg)
    state = init_state(params, tx)
    rng = np.random.RandomState(0)
    images_u8 = jnp.asarray(rng.randint(0, 256, (4, 800, 800, 3), np.uint8))
    poses = jnp.broadcast_to(jnp.eye(4).at[2, 3].set(4.0), (4, 4, 4))
    K = jnp.asarray([[1111.1, 0, 400], [0, 1111.1, 400], [0, 0, 1]],
                    jnp.float32)
    n_rays, n_steps = 1024, 20
    state, stats = train_steps(state, images_u8, poses, K,
                               jax.random.PRNGKey(0), tx, opts, n_rays,
                               n_steps)
    np.asarray(stats["loss"])
    t0 = time.time()
    state, stats = train_steps(state, images_u8, poses, K,
                               jax.random.PRNGKey(0), tx, opts, n_rays,
                               n_steps)
    np.asarray(stats["loss"])
    dt_tr = (time.time() - t0) / n_steps
    tpts = n_rays * (2 * opts.n_samples + opts.n_importance)
    tflops = 3 * tpts * MLP_FLOPS_PER_POINT  # fwd + ~2x bwd
    print(f"train step {n_rays} rays: {dt_tr*1e3:.1f} ms  "
          f"{n_rays/dt_tr:,.0f} rays/s  MFU(e2e) "
          f"{tflops/dt_tr/V5E_BF16_PEAK*100:.1f}%")

    with jax.profiler.trace("/tmp/jaxprof/train"):
        state, stats = train_steps(state, images_u8, poses, K,
                                   jax.random.PRNGKey(1), tx, opts, n_rays,
                                   n_steps)
        np.asarray(stats["loss"])
    print("train trace -> /tmp/jaxprof/train")


if __name__ == "__main__":
    main()
