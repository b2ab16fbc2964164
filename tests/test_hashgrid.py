"""Hash-grid encoder: numpy-oracle interpolation check + gradient flow."""
import numpy as np
import jax
import jax.numpy as jnp

from nerf_tpu.models.hashgrid import (
    hashgrid_encode, hashgrid_out_dim, init_hashgrid, level_resolutions,
    _PRIMES,
)


def np_oracle(table, resolutions, pts, bbox=(-2.0, 2.0)):
    """Independent numpy reimplementation of the lookup math."""
    L, T, F = table.shape
    x = (pts - bbox[0]) / (bbox[1] - bbox[0])
    x = np.clip(x, 0.0, 1.0 - 1e-6)
    out = np.zeros((len(pts), L * F), np.float32)
    for l in range(L):
        res = int(resolutions[l])
        xl = x * res
        x0 = np.floor(xl).astype(np.int64)
        frac = xl - x0
        acc = np.zeros((len(pts), F), np.float32)
        dense = (res + 1) ** 3 <= T
        for i in (0, 1):
            for j in (0, 1):
                for k in (0, 1):
                    c = x0 + np.array([i, j, k])
                    if dense:
                        idx = (c[:, 0] + c[:, 1] * (res + 1)
                               + c[:, 2] * (res + 1) ** 2) % T
                    else:
                        cu = c.astype(np.uint32)
                        idx = (cu[:, 0] * np.uint32(_PRIMES[0])
                               ^ cu[:, 1] * np.uint32(_PRIMES[1])
                               ^ cu[:, 2] * np.uint32(_PRIMES[2])) % np.uint32(T)
                        idx = idx.astype(np.int64)
                    w = np.prod(np.where(np.array([i, j, k]) == 1, frac,
                                         1 - frac), axis=-1)
                    acc += table[l, idx] * w[:, None]
        out[:, l * F:(l + 1) * F] = acc
    return out


def test_matches_numpy_oracle():
    key = jax.random.PRNGKey(0)
    params = init_hashgrid(key, n_levels=4, log2_table_size=10,
                           base_resolution=4, per_level_scale=2.0,
                           dtype=jnp.float32)
    res = level_resolutions(4, 4, 2.0)
    pts = np.random.RandomState(0).uniform(-2, 2, (64, 3)).astype(np.float32)
    got = np.asarray(hashgrid_encode(params, jnp.asarray(pts), resolutions=res))
    want = np_oracle(np.asarray(params["table"]), res, pts)
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert got.shape == (64, hashgrid_out_dim(4, 2))


def test_interpolation_continuity():
    """Features must be continuous across a voxel boundary."""
    params = init_hashgrid(jax.random.PRNGKey(1), n_levels=2,
                           log2_table_size=8, base_resolution=4,
                           per_level_scale=2.0, dtype=jnp.float32)
    eps = 1e-5
    p = jnp.asarray([[0.5 - eps, 0.3, 0.3], [0.5 + eps, 0.3, 0.3]])
    f = np.asarray(hashgrid_encode(params, p, base_resolution=4,
                                   per_level_scale=2.0))
    assert np.abs(f[0] - f[1]).max() < 1e-3


def test_gradients_scatter_to_table():
    params = init_hashgrid(jax.random.PRNGKey(2), n_levels=2,
                           log2_table_size=8, base_resolution=4,
                           per_level_scale=2.0, dtype=jnp.float32)
    pts = jnp.asarray(np.random.RandomState(1).uniform(-1, 1, (16, 3)),
                      jnp.float32)

    def loss(table):
        out = hashgrid_encode({"table": table}, pts, base_resolution=4,
                              per_level_scale=2.0)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(params["table"])
    assert np.isfinite(np.asarray(g)).all()
    assert (np.asarray(g) != 0).any()  # some entries touched


def test_level_resolutions_growth():
    res = level_resolutions(16, 16, 1.3819)
    assert res[0] == 16 and res[-1] > 2000 and (np.diff(res) > 0).all()


def test_fine_levels_use_hash_not_overflowed_dense():
    """Regression: at the default geometry the finest levels (res 1481,
    2047) overflow int32 in (res+1)**3, which used to flip their dense-fits
    test to True and silently alias them through wrapped direct indexing.
    The numpy oracle computes the dense test in Python ints, so a full
    default-geometry comparison catches the bug."""
    res = level_resolutions(16, 16, 1.3819)
    # the precondition that makes this a real test: int32 overflow occurs
    wrapped = (res[-2:].astype(np.int32) + 1)  # res 1481, 2047
    with np.errstate(over="ignore"):
        wrapped = wrapped * wrapped * wrapped
    assert (wrapped < 0).any(), "geometry no longer overflows; update test"
    params = init_hashgrid(jax.random.PRNGKey(6), n_levels=16,
                           log2_table_size=19, dtype=jnp.float32)
    pts = np.random.RandomState(4).uniform(-2, 2, (32, 3)).astype(np.float32)
    got = np.asarray(hashgrid_encode(params, jnp.asarray(pts),
                                     resolutions=res))
    want = np_oracle(np.asarray(params["table"]), res, pts)
    np.testing.assert_allclose(got, want, atol=1e-5)

# ---------------------------------------------------------------------------
# cellpack layout (TPU-native: one wide row per point-level)


def np_oracle_cellpack(table, resolutions, pts, bbox=(-2.0, 2.0)):
    """Independent numpy oracle for the cellpack layout.

    table: [L, Tc, 8*F]; row hash is over the BASE cell coords; the row
    holds the 8 corner features in itertools.product((0,1)) bit order.
    """
    L, Tc, row_w = table.shape
    F = row_w // 8
    x = (pts - bbox[0]) / (bbox[1] - bbox[0])
    x = np.clip(x, 0.0, 1.0 - 1e-6)
    out = np.zeros((len(pts), L * F), np.float32)
    for l in range(L):
        res = int(resolutions[l])
        xl = x * res
        x0 = np.floor(xl).astype(np.int64)
        frac = xl - x0
        dense = res ** 3 <= Tc
        if dense:
            idx = (x0[:, 0] + x0[:, 1] * res + x0[:, 2] * res ** 2) % Tc
        else:
            cu = x0.astype(np.uint32)
            idx = (cu[:, 0] * np.uint32(_PRIMES[0])
                   ^ cu[:, 1] * np.uint32(_PRIMES[1])
                   ^ cu[:, 2] * np.uint32(_PRIMES[2])) % np.uint32(Tc)
            idx = idx.astype(np.int64)
        rows = table[l, idx].reshape(len(pts), 8, F)
        acc = np.zeros((len(pts), F), np.float32)
        c = 0
        for i in (0, 1):
            for j in (0, 1):
                for k in (0, 1):
                    w = np.prod(np.where(np.array([i, j, k]) == 1, frac,
                                         1 - frac), axis=-1)
                    acc += rows[:, c] * w[:, None]
                    c += 1
        out[:, l * F:(l + 1) * F] = acc
    return out


def test_cellpack_matches_numpy_oracle():
    key = jax.random.PRNGKey(3)
    params = init_hashgrid(key, n_levels=4, log2_table_size=10,
                           base_resolution=4, per_level_scale=2.0,
                           dtype=jnp.float32, layout="cellpack")
    assert params["table"].shape == (4, 1 << 7, 16)
    res = level_resolutions(4, 4, 2.0)
    pts = np.random.RandomState(2).uniform(-2, 2, (64, 3)).astype(np.float32)
    got = np.asarray(hashgrid_encode(params, jnp.asarray(pts),
                                     resolutions=res, layout="cellpack"))
    want = np_oracle_cellpack(np.asarray(params["table"]), res, pts)
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert got.shape == (64, hashgrid_out_dim(4, 2))


def test_cellpack_trilinear_within_cell():
    """Inside one cell the encoding must be the trilinear interpolation of
    that row's 8 corner entries (exact at corners, mean at the center)."""
    params = init_hashgrid(jax.random.PRNGKey(4), n_levels=1,
                           log2_table_size=12, base_resolution=4,
                           per_level_scale=2.0, dtype=jnp.float32,
                           layout="cellpack")
    table = np.asarray(params["table"])  # [1, 512, 16]
    # cell (1,2,3) at res 4 over bbox [-2,2]: cell size 1.0, origin -2
    cell = np.array([1, 2, 3])
    dense_idx = cell[0] + cell[1] * 4 + cell[2] * 16  # res^3=64 <= 512
    row = table[0, dense_idx].reshape(8, 2)
    center = -2.0 + (cell + 0.5) * 1.0
    got = np.asarray(hashgrid_encode(
        params, jnp.asarray([center], jnp.float32), base_resolution=4,
        per_level_scale=2.0, layout="cellpack"))
    np.testing.assert_allclose(got[0], row.mean(0), atol=1e-6)


def test_cellpack_gradients_scatter_to_table():
    params = init_hashgrid(jax.random.PRNGKey(5), n_levels=2,
                           log2_table_size=8, base_resolution=4,
                           per_level_scale=2.0, dtype=jnp.float32,
                           layout="cellpack")
    pts = jnp.asarray(np.random.RandomState(3).uniform(-1, 1, (16, 3)),
                      jnp.float32)

    def loss(table):
        out = hashgrid_encode({"table": table}, pts, base_resolution=4,
                              per_level_scale=2.0, layout="cellpack")
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(params["table"])
    assert np.isfinite(np.asarray(g)).all()
    assert (np.asarray(g) != 0).any()


def test_cellpack_render_smoke():
    """End-to-end render_rays with hash_layout=cellpack compiles and runs."""
    from nerf_tpu.render.renderer import RenderOptions, render_rays
    from nerf_tpu.train.loop import init_nerf_params

    opts = RenderOptions(
        xyz_encoder_type="hashgrid", hash_layout="cellpack",
        hash_levels=4, hash_log2_size=10, hash_base_res=4, hash_scale=2.0,
        hash_dtype="float32", n_samples=8, n_importance=8,
        mlp_depth=2, mlp_width=32, skips=(), tile_rays=8,
        use_pallas=False, compute_dtype="float32",
        sigma_activation="softplus",
    )
    params = init_nerf_params(jax.random.PRNGKey(0), opts)
    assert params["fine"]["xyz_encoder"]["table"].shape[-1] == 16
    rays_o = jnp.zeros((8, 3))
    rays_d = jnp.stack([jnp.linspace(-0.2, 0.2, 8),
                        jnp.zeros(8), -jnp.ones(8)], -1)
    out = render_rays(params, rays_o, rays_d, jax.random.PRNGKey(1), opts,
                      train=False)
    assert np.isfinite(np.asarray(out["rgb_map"])).all()


def test_cellpack_custom_vjp_matches_plain_gather_grad():
    """The narrow-split backward must equal the plain gather's autodiff
    gradient exactly (same adds, different scatter shape)."""
    from nerf_tpu.models.hashgrid import _gather_rows_narrow_bwd

    rng = np.random.RandomState(7)
    table = jnp.asarray(rng.randn(32, 16), jnp.float32)
    idx = jnp.asarray(rng.randint(0, 32, (100,)), jnp.int32)
    ct = jnp.asarray(rng.randn(100, 16), jnp.float32)

    def loss_custom(t):
        return jnp.sum(_gather_rows_narrow_bwd(t, idx, 8) * ct)

    def loss_plain(t):
        return jnp.sum(t[idx] * ct)

    g1 = jax.grad(loss_custom)(table)
    g2 = jax.grad(loss_plain)(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)


def test_slotpack_vjp_matches_plain_gather_grad():
    """The slotpack backward (8 rows packed per 128-wide super-row, the
    round-5 fast path) must equal the plain gather's autodiff gradient."""
    from nerf_tpu.models.hashgrid import _gather_rows_slotpack_bwd

    rng = np.random.RandomState(11)
    table = jnp.asarray(rng.randn(64, 16), jnp.float32)
    # include heavy duplication (the realistic coarse-level case)
    idx = jnp.asarray(rng.randint(0, 8, (200,)), jnp.int32)
    ct = jnp.asarray(rng.randn(200, 16), jnp.float32)

    def loss_custom(t):
        return jnp.sum(_gather_rows_slotpack_bwd(t, idx) * ct)

    def loss_plain(t):
        return jnp.sum(t[idx] * ct)

    g1 = jax.grad(loss_custom)(table)
    g2 = jax.grad(loss_plain)(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5)

    # forward parity too
    np.testing.assert_allclose(
        np.asarray(_gather_rows_slotpack_bwd(table, idx)),
        np.asarray(table[idx]))
