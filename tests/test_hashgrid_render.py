"""End-to-end render + train step with the hashgrid xyz encoder (CPU)."""
import dataclasses

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


def test_softplus_density_survives_negative_bias():
    # the collapse mode: adam pushes the density bias negative; relu then
    # has zero gradient for every point (dead), softplus does not
    from nerf_tpu.render.composite import composite

    raw = jnp.zeros((4, 8, 4)).at[..., 3].set(-3.0)  # post-collapse sigma raw
    z = jnp.tile(jnp.linspace(2.0, 6.0, 8), (4, 1))
    d = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (4, 1))

    def acc_sum(r, kind):
        return composite(r, z, d, sigma_activation=kind)["acc_map"].sum()

    g_relu = jax.grad(lambda r: acc_sum(r, "relu"))(raw)
    g_soft = jax.grad(lambda r: acc_sum(r, "softplus"))(raw)
    assert float(jnp.abs(g_relu[..., 3]).max()) == 0.0
    assert float(jnp.abs(g_soft[..., 3]).max()) > 0.0


def test_compaction_fill_is_empty_under_softplus():
    # dropped (masked-out) samples must composite as exactly-zero density
    # under softplus too (raw fill 0 would give sigma ~0.69)
    from nerf_tpu.render.renderer import query_masked_compacted

    opts = dataclasses.replace(_opts(), sigma_activation="softplus")
    params = init_nerf_params(jax.random.PRNGKey(0), opts)
    pts = jnp.zeros((4, 8, 3))
    dirs = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (4, 1))
    mask = jnp.zeros((4, 8), bool).at[:, 0].set(True)
    from nerf_tpu.render.renderer import query_network_xla

    raw = query_masked_compacted(
        query_network_xla, params["coarse"], pts, dirs, opts, mask, cap=8)
    import jax.nn as jnn

    sig = jnn.softplus(raw[..., 3])
    assert float(sig[:, 1:].max()) == 0.0  # dropped -> exactly empty
    assert float(sig[:, 0].min()) > 0.0  # kept -> live density


def test_density_fn_with_hashgrid():
    # occupancy-grid rebuilds query the coarse model through make_density_fn;
    # it must route xyz through the hash encoder, not freq_encode
    from nerf_tpu.train.loop import make_density_fn

    opts = _opts()
    params = init_nerf_params(jax.random.PRNGKey(0), opts)
    density = make_density_fn(params["coarse"], opts)
    d = np.asarray(density(jnp.linspace(-1, 1, 15).reshape(5, 3)))
    assert d.shape == (5,) and np.isfinite(d).all() and (d >= 0).all()


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
