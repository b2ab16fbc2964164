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


def test_padding_path():
    raw, z, d = _inputs(n=50)  # not a multiple of tile
    got = integrate_pallas(
        jnp.asarray(raw[..., 3]), jnp.asarray(raw[..., :3]),
        jnp.asarray(z), jnp.asarray(d), tile=32, interpret=True,
    )
    assert got["rgb_map"].shape == (50, 3)
    assert np.isfinite(np.asarray(got["rgb_map"])).all()
