"""End-to-end render + train step with the hashgrid xyz encoder (CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from nerf_tpu.render.renderer import RenderOptions, render_rays
from nerf_tpu.train.loop import init_nerf_params


def _opts():
    return RenderOptions(
        n_samples=8, n_importance=8, compute_dtype="float32",
        enable_ess=False, enable_ert=False, use_pallas=False,
        xyz_encoder_type="hashgrid", hash_levels=4, hash_log2_size=10,
        hash_base_res=4, hash_scale=2.0,
    )


def test_render_with_hashgrid():
    opts = _opts()
    assert opts.input_ch == 8
    params = init_nerf_params(jax.random.PRNGKey(0), opts)
    assert "xyz_encoder" in params["coarse"]
    rays_o = jnp.zeros((32, 3))
    rays_d = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (32, 1))
    out = render_rays(params, rays_o, rays_d, jax.random.PRNGKey(1), opts)
    assert np.isfinite(np.asarray(out["rgb_map"])).all()


def test_hashgrid_table_gets_gradients():
    opts = _opts()
    params = init_nerf_params(jax.random.PRNGKey(0), opts)
    rays_o = jnp.zeros((16, 3))
    rays_d = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (16, 1))
    target = jnp.zeros((16, 3))

    def loss(p):
        out = render_rays(p, rays_o, rays_d, jax.random.PRNGKey(1), opts,
                          train=True)
        return jnp.mean((out["rgb_map"] - target) ** 2) + jnp.mean(
            (out["rgb_map_0"] - target) ** 2)

    g = jax.grad(loss)(params)
    gt = np.asarray(g["coarse"]["xyz_encoder"]["table"])
    assert np.isfinite(gt).all() and (gt != 0).any()
