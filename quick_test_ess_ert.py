#!/usr/bin/env python
"""Quick ESS/ERT smoke test with a synthetic camera and random weights.

Parity surface: reference ``quick_test_ess_ert.py`` — runs without any
trained model or dataset (identity pose at z=4, 100x100 then 50x50 render),
prints check lines, plus a mini perf comparison.
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from nerf_tpu.render import occupancy as occ
    from nerf_tpu.render.renderer import RenderOptions, render_image
    from nerf_tpu.train.loop import init_nerf_params

    opts = RenderOptions(compute_dtype="float32", tile_rays=4096)
    params = init_nerf_params(jax.random.PRNGKey(0), opts)
    grid = occ.init_grid(jax.random.PRNGKey(1))
    pose = jnp.eye(4).at[2, 3].set(4.0)

    for H in (100, 50):
        W = H
        f = 1.4 * W
        K = jnp.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], jnp.float32)
        out = render_image(params, pose, K, jax.random.PRNGKey(0), H, W, opts,
                           grid=grid)
        rgb = np.asarray(out["rgb_map"])
        ok = np.isfinite(rgb).all() and rgb.shape == (H, W, 3)
        print(f"{'✓' if ok else '✗'} {H}x{W} render: shape {rgb.shape}, "
              f"range [{rgb.min():.3f}, {rgb.max():.3f}]")
        assert ok

    # mini perf comparison (all four ESS/ERT combos at 100x100)
    H = W = 100
    f = 1.4 * W
    K = jnp.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], jnp.float32)
    for name, ess, ert in (("baseline", False, False), ("ess+ert", True, True)):
        o = dataclasses.replace(opts, enable_ess=ess, enable_ert=ert)
        g = grid if ess else None
        render_image(params, pose, K, jax.random.PRNGKey(0), H, W, o, grid=g)
        t0 = time.time()
        out = render_image(params, pose, K, jax.random.PRNGKey(1), H, W, o, grid=g)
        np.asarray(out["rgb_map"])
        print(f"✓ {name}: {time.time() - t0:.3f}s")

    print("✓ all quick ESS/ERT checks passed")


if __name__ == "__main__":
    sys.exit(main())
