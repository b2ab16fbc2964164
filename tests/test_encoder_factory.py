"""Encoder factory + spherical harmonics."""
import numpy as np
import jax
import jax.numpy as jnp

from nerf_tpu.models.encoders import get_encoder, sh_encode, sh_out_dim


def test_sh_orthonormality():
    """SH basis functions are orthonormal over the sphere (Monte Carlo)."""
    rng = np.random.RandomState(0)
    d = rng.randn(200000, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    Y = np.asarray(sh_encode(jnp.asarray(d, jnp.float32), degree=3))
    gram = (Y.T @ Y) / len(d) * 4 * np.pi
    np.testing.assert_allclose(gram, np.eye(sh_out_dim(3)), atol=0.05)


def test_factory_frequency():
    fn, dim = get_encoder({"type": "frequency", "input_dim": 3, "freq": 10})
    assert dim == 63
    assert fn(jnp.zeros((2, 3))).shape == (2, 63)


def test_factory_sh():
    fn, dim = get_encoder({"type": "sphere_harmonics", "degree": 4})
    assert dim == 16
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    assert fn(d).shape == (1, 16)


def test_factory_hashgrid_and_triplane():
    key = jax.random.PRNGKey(0)
    p, fn, dim = get_encoder(
        {"type": "hashgrid", "n_levels": 4, "log2_hashmap_size": 10,
         "base_resolution": 4, "per_level_scale": 2.0}, key)
    assert dim == 8
    assert fn(p, jnp.zeros((5, 3))).shape == (5, 8)

    p2, fn2, dim2 = get_encoder(
        {"type": "triplane", "resolution": 16, "n_features": 4}, key)
    assert dim2 == 12
    assert fn2(p2, jnp.zeros((5, 3))).shape == (5, 12)
