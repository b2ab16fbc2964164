"""Golden-image regression: a fixed-seed render must stay bit-stable.

SURVEY.md §4 — the reference's behavioral contract is defined by the
renderer math; this pins a deterministic (perturb=0, noise=0, float32)
miniature render so any numerical drift in sampling/query/compositing is
caught at once. Regenerate with: python tests/test_golden_render.py
"""
import os

import numpy as np
import jax
import jax.numpy as jnp

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "lego_like_32x32.npy")


def _render():
    from nerf_tpu.render.renderer import RenderOptions, render_image
    from nerf_tpu.train.loop import init_nerf_params

    opts = RenderOptions(
        n_samples=16, n_importance=16, perturb=0.0, raw_noise_std=0.0,
        enable_ess=False, enable_ert=False, compute_dtype="float32",
        tile_rays=256, use_pallas=False, detach_fine_sampling=False,
    )
    params = init_nerf_params(jax.random.PRNGKey(0), opts)
    H = W = 32
    K = jnp.asarray([[35.0, 0, W / 2], [0, 35.0, H / 2], [0, 0, 1]])
    pose = jnp.eye(4).at[2, 3].set(4.0)
    out = render_image(params, pose, K, jax.random.PRNGKey(0), H, W, opts)
    return np.asarray(out["rgb_map"]).astype(np.float32)


def test_golden_render():
    got = _render()
    assert os.path.exists(GOLDEN), "golden file missing; run this file as a script"
    want = np.load(GOLDEN)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")
    arr = _render()
    np.save(GOLDEN, arr)
    print(f"golden written: {GOLDEN} shape={arr.shape} "
          f"mean={arr.mean():.6f}")
