"""Blockwise marching renderer: carry correctness vs one-shot compositing."""
import numpy as np
import jax
import jax.numpy as jnp

from nerf_tpu.render.composite import composite
from nerf_tpu.render.marched import ray_aabb, render_rays_marched
from nerf_tpu.render.renderer import RenderOptions, query_network_xla
from nerf_tpu.train.loop import init_nerf_params


def _opts(**kw):
    base = dict(compute_dtype="float32", enable_ess=False, enable_ert=False,
                use_pallas=False, white_bkgd=True)
    base.update(kw)
    return RenderOptions(**base)


def test_ray_aabb():
    rays_o = jnp.asarray([[0.0, 0.0, 5.0], [10.0, 0.0, 5.0]])
    rays_d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    te, tx, hit = ray_aabb(rays_o, rays_d, jnp.full((3,), -2.0),
                           jnp.full((3,), 2.0), 2.0, 6.0)
    assert bool(hit[0]) and not bool(hit[1])
    assert abs(float(te[0]) - 3.0) < 1e-5 and abs(float(tx[0]) - 6.0) < 1e-5


def test_block_carry_matches_single_composite():
    """Marching in 8 blocks must equal compositing all samples at once."""
    opts = _opts()
    params = init_nerf_params(jax.random.PRNGKey(0), opts)
    rng = np.random.RandomState(0)
    n = 16
    rays_o = jnp.zeros((n, 3))
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays_d = jnp.asarray(d)

    n_blocks, K = 8, 8
    out = render_rays_marched(params, rays_o, rays_d, jax.random.PRNGKey(1),
                              opts, n_blocks=n_blocks, block_samples=K,
                              query_fn=query_network_xla)

    # oracle: same fixed-dt samples composited in one shot
    te, tx, hit = ray_aabb(rays_o, rays_d, jnp.full((3,), -2.0),
                           jnp.full((3,), 2.0), opts.near, opts.far)
    total = n_blocks * K
    dt = (tx - te) / total
    s = jnp.arange(total)
    z = te[:, None] + (s[None, :] + 0.5) * dt[:, None]
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    raw = query_network_xla(params["fine"], pts, rays_d, opts)
    # one-shot compositing with per-sample dists = dt (constant), no 1e10 tail
    sigma = jax.nn.relu(raw[..., 3])
    alpha = 1.0 - jnp.exp(-sigma * dt[:, None])
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[:, :1]),
                         1.0 - alpha[:, :-1] + 1e-10], axis=-1), axis=-1)
    w = alpha * trans
    rgb = jax.nn.sigmoid(raw[..., :3])
    want_rgb = jnp.sum(w[..., None] * rgb, axis=1) + (
        1.0 - jnp.sum(w, axis=1))[:, None]

    np.testing.assert_allclose(np.asarray(out["rgb_map"]),
                               np.asarray(want_rgb), atol=2e-4)


def test_ert_reduces_transmittance_work():
    """With ERT on, terminated rays stop accumulating (output unchanged)."""
    opts_off = _opts()
    opts_on = _opts(enable_ert=True, ert_threshold=0.01)
    params = init_nerf_params(jax.random.PRNGKey(2), opts_on)
    # boost density so rays terminate quickly
    params["fine"]["alpha_linear"]["b"] = (
        params["fine"]["alpha_linear"]["b"] + 5.0)
    rng = np.random.RandomState(1)
    rays_o = jnp.zeros((8, 3))
    d = rng.randn(8, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays_d = jnp.asarray(d)
    a = render_rays_marched(params, rays_o, rays_d, jax.random.PRNGKey(0),
                            opts_off, query_fn=query_network_xla)
    b = render_rays_marched(params, rays_o, rays_d, jax.random.PRNGKey(0),
                            opts_on, query_fn=query_network_xla)
    # dense rays: ERT masking changes only the tail where T < 1% -> tiny diff
    np.testing.assert_allclose(np.asarray(a["rgb_map"]),
                               np.asarray(b["rgb_map"]), atol=2e-2)


def test_marched_compaction_matches_uncompacted():
    """Unified ESS+ERT compaction in the marched path: with generous
    capacity, the compacted render must match the plain masked render."""
    from nerf_tpu.render import occupancy as occ

    params = init_nerf_params(jax.random.PRNGKey(0), _opts())
    rng = np.random.RandomState(1)
    n = 128
    rays_o = jnp.zeros((n, 3))
    d = rng.randn(n, 3).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.5  # point roughly into the box
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays_o = jnp.asarray(np.tile([0.0, 0.0, 4.0], (n, 1)).astype(np.float32))
    rays_d = jnp.asarray(d)

    # partially-occupied grid (seed sphere + sprinkle) so the compaction
    # gather path actually engages: kept fraction < capacity < 1
    grid = occ.init_grid(jax.random.PRNGKey(7), 32)
    from nerf_tpu.render.renderer import compaction_capacity

    assert compaction_capacity(n * 8, 0.75) < n * 8  # gather engaged per block
    base = _opts(enable_ess=True, enable_ert=True)
    out_full = render_rays_marched(
        params, rays_o, rays_d, jax.random.PRNGKey(1), base,
        grid=grid, n_blocks=4, block_samples=8)
    out_comp = render_rays_marched(
        params, rays_o, rays_d, jax.random.PRNGKey(1),
        _opts(enable_ess=True, enable_ert=True, ess_compaction=0.75),
        grid=grid, n_blocks=4, block_samples=8)
    np.testing.assert_allclose(np.asarray(out_comp["rgb_map"]),
                               np.asarray(out_full["rgb_map"]),
                               rtol=1e-4, atol=1e-4)

    # tight capacity still yields finite, plausible output (graceful holes)
    out_tight = render_rays_marched(
        params, rays_o, rays_d, jax.random.PRNGKey(1),
        _opts(enable_ess=True, enable_ert=True, ess_compaction=0.5),
        grid=grid, n_blocks=4, block_samples=8)
    assert np.all(np.isfinite(np.asarray(out_tight["rgb_map"])))


def test_refocus_marches_occupied_span():
    """With a slab-occupied grid, refocusing must (a) stay finite, (b) put
    the depth estimate inside the occupied slab, and (c) equal the
    unrefocused render when the whole bbox is occupied (full grid)."""
    from nerf_tpu.render import occupancy as occ

    opts = _opts(enable_ess=True)
    params = init_nerf_params(jax.random.PRNGKey(2), opts)
    n = 8
    rays_o = jnp.zeros((n, 3))
    rays_d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (n, 3))

    # full grid: refocus is a no-op (entire span occupied)
    g_full = occ.full_grid(16)
    a = render_rays_marched(params, rays_o, rays_d, jax.random.PRNGKey(3),
                            opts, grid=g_full, n_blocks=4, block_samples=8,
                            query_fn=query_network_xla, refocus=True)
    b = render_rays_marched(params, rays_o, rays_d, jax.random.PRNGKey(3),
                            opts, grid=g_full, n_blocks=4, block_samples=8,
                            query_fn=query_network_xla, refocus=False)
    np.testing.assert_allclose(np.asarray(a["rgb_map"]),
                               np.asarray(b["rgb_map"]), atol=1e-5)

    # slab grid: occupied only for z in [-0.5, 0.5] (ray z range [3.5, 4.5])
    res = 16
    occ3d = np.zeros((res, res, res), bool)
    occ3d[:, :, 6:10] = True  # z slab around 0
    g_slab = occ.OccupancyGrid(
        occupied=jnp.asarray(occ3d),
        bbox_min=g_full.bbox_min, bbox_max=g_full.bbox_max)
    out = render_rays_marched(params, rays_o, rays_d, jax.random.PRNGKey(4),
                              opts, grid=g_slab, n_blocks=4, block_samples=8,
                              query_fn=query_network_xla, refocus=True)
    rgb = np.asarray(out["rgb_map"])
    assert np.isfinite(rgb).all()
    acc = np.asarray(out["acc_map"])
    depth = np.asarray(out["depth_map"]) / np.maximum(acc, 1e-8)
    # wherever anything was hit, its depth lies in the slab's z-range
    hit = acc > 1e-3
    if hit.any():
        assert (depth[hit] > 3.2).all() and (depth[hit] < 4.8).all()
