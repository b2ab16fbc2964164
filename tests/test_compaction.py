"""ESS masked compaction: exactness vs uncompacted when capacity suffices."""
import numpy as np
import jax
import jax.numpy as jnp

from nerf_tpu.render import occupancy as occ
from nerf_tpu.render.renderer import (
    RenderOptions, query_network_xla, query_with_compaction, render_rays,
)
from nerf_tpu.train.loop import init_nerf_params


def _setup(frac=0.75):
    opts = RenderOptions(
        n_samples=16, n_importance=16, compute_dtype="float32",
        enable_ess=True, enable_ert=False, use_pallas=False, perturb=0.0,
        ess_compaction=frac,
    )
    params = init_nerf_params(jax.random.PRNGKey(0), opts)
    # half-space occupancy: x < 0 occupied
    res = 32
    coords = np.linspace(-2, 2, res)
    occ_grid = np.zeros((res, res, res), bool)
    occ_grid[coords < 0] = True
    grid = occ.OccupancyGrid(
        occupied=jnp.asarray(occ_grid),
        bbox_min=jnp.full((3,), -2.0), bbox_max=jnp.full((3,), 2.0),
    )
    return opts, params, grid


def test_compacted_query_exact_where_occupied():
    opts, params, grid = _setup()
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(-2, 2, (64, 16, 3)).astype(np.float32))
    dirs_ = rng.randn(64, 3).astype(np.float32)
    dirs_ /= np.linalg.norm(dirs_, axis=-1, keepdims=True)
    dirs = jnp.asarray(dirs_)

    full = np.asarray(query_network_xla(params["coarse"], pts, dirs, opts))
    comp = np.asarray(query_with_compaction(
        query_network_xla, params["coarse"], pts, dirs, opts, grid))

    mask = np.asarray(occ.query(grid, pts))
    # ~50% of 1024 points occupied; capacity 0.75*1024=768 -> headroom, all
    # occupied samples evaluated exactly
    assert mask.sum() <= 768
    np.testing.assert_allclose(comp[mask], full[mask], atol=1e-6)
    # empty samples: rgb raw zero, sigma raw = the empty fill (maps to
    # exactly-zero density under every activation)
    from nerf_tpu.render.composite import EMPTY_SIGMA_RAW

    assert (comp[~mask][:, :3] == 0).all()
    assert (comp[~mask][:, 3] == EMPTY_SIGMA_RAW).all()


def test_render_rays_with_compaction_close_to_full():
    opts, params, grid = _setup()
    rng = np.random.RandomState(1)
    rays_o = jnp.asarray(np.zeros((32, 3), np.float32))
    d = rng.randn(32, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays_d = jnp.asarray(d)

    out_c = render_rays(params, rays_o, rays_d, jax.random.PRNGKey(0), opts,
                        grid=grid)
    # same but compaction off AND network zeroed in empty space manually:
    import dataclasses

    opts_off = dataclasses.replace(opts, ess_compaction=0.0)
    out_f = render_rays(params, rays_o, rays_d, jax.random.PRNGKey(0),
                        opts_off, grid=grid)
    # rgb close: empty-space sigma contributes ~0 alpha either way, but the
    # full render's empty samples have nonzero density from the random MLP;
    # so only check shapes/finiteness here plus exactness via the query test
    assert np.isfinite(np.asarray(out_c["rgb_map"])).all()
    assert out_c["rgb_map"].shape == out_f["rgb_map"].shape


def test_compaction_gradients():
    opts, params, grid = _setup()
    rng = np.random.RandomState(2)
    pts = jnp.asarray(rng.uniform(-2, 2, (16, 16, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.randn(16, 3).astype(np.float32))

    def loss(p):
        raw = query_with_compaction(query_network_xla, p, pts, dirs, opts,
                                    grid)
        return jnp.sum(raw ** 2)

    g = jax.grad(loss)(params["coarse"])
    gw = np.asarray(g["pts_linears"][0]["w"])
    assert np.isfinite(gw).all() and (gw != 0).any()


def test_fine_pass_ert_compaction_matches_dense():
    """Hierarchical compaction (fine pass, occ & coarse-T mask) must match
    the dense ERT render when capacity is generous: the skipped samples are
    exactly the ones the ERT composite zeroes."""
    import dataclasses

    opts = RenderOptions(
        n_samples=16, n_importance=16, compute_dtype="float32",
        enable_ess=True, enable_ert=True, ert_threshold=0.01,
        use_pallas=False, perturb=0.0, ess_compaction=0.9,
    )
    params = init_nerf_params(jax.random.PRNGKey(3), opts)
    # share density between coarse and fine so the coarse-T estimate is
    # faithful, and bias it up so rays actually terminate (ERT engages)
    params["fine"] = params["coarse"]
    params["coarse"]["alpha_linear"]["b"] = (
        params["coarse"]["alpha_linear"]["b"] + 4.0)

    grid = occ.full_grid(32)
    rng = np.random.RandomState(4)
    rays_o = jnp.asarray(np.tile([0.0, 0.0, 4.0], (64, 1)).astype(np.float32))
    d = rng.randn(64, 3).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays_d = jnp.asarray(d)

    out_comp = render_rays(params, rays_o, rays_d, jax.random.PRNGKey(0),
                           opts, grid=grid)
    out_full = render_rays(params, rays_o, rays_d, jax.random.PRNGKey(0),
                           dataclasses.replace(opts, ess_compaction=0.0),
                           grid=grid)
    np.testing.assert_allclose(np.asarray(out_comp["rgb_map"]),
                               np.asarray(out_full["rgb_map"]),
                               rtol=5e-3, atol=5e-3)
    # the compaction must have real headroom: kept fraction < capacity
    # (dense rays with +4 bias terminate within a few samples)
    cw = np.asarray(out_full["coarse_weights"])
    t_after = 1.0 - np.cumsum(cw, -1)
    kept = (t_after >= 0.01).mean()
    assert kept < 0.6  # most fine samples are past termination


def test_compaction_disabled_in_training():
    """Compaction is an inference optimization and must be OFF under
    train=True: early in training the kept rate (occ & coarse-T mask)
    exceeds any useful capacity fraction, and the global cumsum compaction
    then drops EVERY sample of every ray past the capacity prefix — those
    rays composite to pure background with zero gradient to the fine model
    (the round-1 "lego_hashgrid fine model never trains" failure)."""
    import dataclasses

    opts, params, grid = _setup(frac=0.05)  # starved capacity
    grid = occ.full_grid(32)  # everything occupied: kept rate ~100%
    rng = np.random.RandomState(5)
    rays_o = jnp.asarray(np.zeros((32, 3), np.float32))
    d = rng.randn(32, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays_d = jnp.asarray(d)

    out_tr = render_rays(params, rays_o, rays_d, jax.random.PRNGKey(0), opts,
                         grid=grid, train=True)
    out_off = render_rays(
        params, rays_o, rays_d, jax.random.PRNGKey(0),
        dataclasses.replace(opts, ess_compaction=0.0), grid=grid, train=True)
    np.testing.assert_array_equal(np.asarray(out_tr["rgb_map"]),
                                  np.asarray(out_off["rgb_map"]))

    # and the fine model gets gradient from EVERY ray (the starved-capacity
    # eval path would zero the suffix rays' fine gradients entirely)
    def last_ray_loss(p):
        out = render_rays(p, rays_o, rays_d, jax.random.PRNGKey(0), opts,
                          grid=grid, train=True)
        return jnp.sum(out["rgb_map"][-1] ** 2)

    g = jax.grad(last_ray_loss)(params)
    gw = np.asarray(g["fine"]["pts_linears"][0]["w"])
    assert np.isfinite(gw).all() and (gw != 0).any()


def test_calibrate_compaction_quality_neutral():
    """Capacity-aware calibration (round 5): the calibrated fraction must
    cover the actual kept rate, so compacted rendering matches dense."""
    from nerf_tpu.render.renderer import (
        calibrate_compaction, resolve_compaction,
    )
    import dataclasses

    opts, params, grid = _setup(frac=0.0)
    rng = np.random.RandomState(3)
    n = 64
    rays_o = jnp.asarray(
        np.tile([[2.5, 0.0, 0.0]], (n, 1)).astype(np.float32))
    d = np.concatenate(
        [-np.ones((n, 1)), 0.3 * rng.randn(n, 2)], axis=1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays_d = jnp.asarray(d)
    key = jax.random.PRNGKey(0)

    frac = calibrate_compaction(params, rays_o, rays_d, key, opts, grid)
    assert 0.0 <= frac < 1.0

    auto_opts = dataclasses.replace(opts, ess_compaction=-1.0)
    resolved = resolve_compaction(auto_opts, params, grid, rays_o, rays_d)
    assert resolved.ess_compaction >= 0.0

    if frac > 0.0:
        dense = render_rays(params, rays_o, rays_d, key, opts, grid=grid)
        comp = render_rays(
            params, rays_o, rays_d, key,
            dataclasses.replace(opts, ess_compaction=frac), grid=grid)
        np.testing.assert_allclose(
            np.asarray(comp["rgb_map"]), np.asarray(dense["rgb_map"]),
            atol=1e-5)


def test_calibrate_compaction_disables_when_kept_rate_high():
    """When nearly every fine sample is kept (the ESS-refocus regime),
    calibration must return 0.0 (dense path) instead of a harmful cap."""
    from nerf_tpu.render.renderer import calibrate_compaction

    opts, params, _ = _setup(frac=0.0)
    # fully-occupied grid + ERT off => kept rate 1.0
    res = 8
    grid = occ.OccupancyGrid(
        occupied=jnp.ones((res, res, res), bool),
        bbox_min=jnp.full((3,), -2.0), bbox_max=jnp.full((3,), 2.0),
    )
    rng = np.random.RandomState(4)
    rays_o = jnp.zeros((32, 3), jnp.float32)
    d = rng.randn(32, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays_d = jnp.asarray(d)

    frac = calibrate_compaction(params, rays_o, rays_d,
                                jax.random.PRNGKey(1), opts, grid)
    assert frac == 0.0
