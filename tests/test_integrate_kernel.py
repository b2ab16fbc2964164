"""Pallas integration kernel vs render/composite.py (interpret mode)."""
import numpy as np
import jax.numpy as jnp

from nerf_tpu.ops.integrate import integrate_pallas
from nerf_tpu.render.composite import composite


def _inputs(n=96, s=64, seed=0):
    rng = np.random.RandomState(seed)
    raw = rng.randn(n, s, 4).astype(np.float32)
    z = np.sort(rng.uniform(2, 6, (n, s)).astype(np.float32), axis=-1)
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return raw, z, d


def _compare(ert):
    raw, z, d = _inputs()
    want = composite(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(d),
                     white_bkgd=True,
                     ert_threshold=(ert if ert > 0 else None))
    got = integrate_pallas(
        jnp.asarray(raw[..., 3]), jnp.asarray(raw[..., :3]),
        jnp.asarray(z), jnp.asarray(d),
        ert_threshold=ert, white_bkgd=True, tile=32, interpret=True,
    )
    for k in ("rgb_map", "depth_map", "acc_map", "weights"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), atol=2e-5,
            err_msg=k,
        )


def test_matches_composite_no_ert():
    _compare(0.0)


def test_matches_composite_with_ert():
    _compare(0.01)


def test_softplus_activation():
    raw, z, d = _inputs()
    want = composite(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(d),
                     white_bkgd=True, sigma_activation="softplus")
    got = integrate_pallas(
        jnp.asarray(raw[..., 3]), jnp.asarray(raw[..., :3]),
        jnp.asarray(z), jnp.asarray(d),
        white_bkgd=True, tile=32, interpret=True,
        sigma_activation="softplus",
    )
    for k in ("rgb_map", "depth_map", "acc_map", "weights"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), atol=2e-5, err_msg=k)


def test_composite_pallas_grad_parity():
    """use_pallas_integrate is legal in training: the custom VJP must match
    the XLA composite's gradients."""
    import jax

    from nerf_tpu.ops.integrate import composite_pallas

    raw, z, d = _inputs(n=32, s=16)
    raw_j, z_j, d_j = jnp.asarray(raw), jnp.asarray(z), jnp.asarray(d)
    tgt = jnp.asarray(np.random.RandomState(1).rand(32, 3).astype(np.float32))

    def loss_pallas(r, zz):
        out = composite_pallas(r, zz, d_j, white_bkgd=True,
                               ert_threshold=0.01, tile=32, interpret=True)
        return jnp.mean((out["rgb_map"] - tgt) ** 2) + 0.1 * jnp.mean(
            out["weights"])

    def loss_xla(r, zz):
        out = composite(r, zz, d_j, white_bkgd=True, ert_threshold=0.01)
        return jnp.mean((out["rgb_map"] - tgt) ** 2) + 0.1 * jnp.mean(
            out["weights"])

    g_p = jax.grad(loss_pallas, argnums=(0, 1))(raw_j, z_j)
    g_x = jax.grad(loss_xla, argnums=(0, 1))(raw_j, z_j)
    for got, want in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-4)


def test_padding_path():
    raw, z, d = _inputs(n=50)  # not a multiple of tile
    got = integrate_pallas(
        jnp.asarray(raw[..., 3]), jnp.asarray(raw[..., :3]),
        jnp.asarray(z), jnp.asarray(d), tile=32, interpret=True,
    )
    assert got["rgb_map"].shape == (50, 3)
    assert np.isfinite(np.asarray(got["rgb_map"])).all()
