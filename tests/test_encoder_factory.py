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


DYN_CFG = {"n_levels": 4, "log2_hashmap_size": 10, "base_resolution": 4,
           "per_level_scale": 2.0, "num_frames": 10}


def test_factory_dynamic_hash_variants():
    key = jax.random.PRNGKey(0)
    xyzt = jnp.concatenate(
        [jnp.zeros((5, 3)), jnp.full((5, 1), 3.0)], axis=-1)

    p, fn, dim = get_encoder({"type": "cuda_hashgrid_4d", **DYN_CFG}, key)
    assert fn(p, xyzt).shape == (5, dim) and dim == 8

    p, fn, dim = get_encoder(
        {"type": "cuda_hashgrid_latent", "latent_dim": 6, **DYN_CFG}, key)
    assert fn(p, xyzt).shape == (5, dim) and dim == 8 + 6

    p, fn, dim = get_encoder(
        {"type": "cuda_hashgrid_coef", "basis_num": 2, "coef_hidden": 8,
         **DYN_CFG}, key)
    assert fn(p, xyzt).shape == (5, dim) and dim == 8

    p, fn, dim = get_encoder(
        {"type": "cuda_motion2d", "deform_width": 8, "deform_depth": 2,
         **DYN_CFG}, key)
    assert fn(p, xyzt).shape == (5, dim) and dim == 24


def test_factory_dnerf_variants():
    key = jax.random.PRNGKey(1)
    pts = jnp.zeros((5, 3))
    t = jnp.full((5, 1), 0.5)

    p, fn, dim = get_encoder(
        {"type": "dnerf", "freq": 4, "deform_width": 8, "deform_depth": 2},
        key)
    assert fn(p, pts, t).shape == (5, dim) and dim == 3 * (2 * 4 + 1)

    for name in ("dnerf_ngp_mlp", "dnerf_ngp_tensorf",
                 "cuda_dnerf_ngp_tensorf"):
        p, fn, dim = get_encoder(
            {"type": name, "deform_width": 8, "deform_depth": 2, **DYN_CFG},
            key)
        assert fn(p, pts, t).shape == (5, dim) and dim == 8

    p, fn, dim = get_encoder(
        {"type": "dnerf_mlp_tensorf", "resolution": 16, "n_features": 4,
         "deform_width": 8, "deform_depth": 2}, key)
    assert fn(p, pts, t).shape == (5, dim) and dim == 12

    # deformation head is zero-init -> t=0 matches the undeformed encoding
    p, fn, dim = get_encoder(
        {"type": "dnerf", "freq": 4, "deform_width": 8, "deform_depth": 2},
        key)
    from nerf_tpu.models.encoders import freq_encode

    np.testing.assert_allclose(
        np.asarray(fn(p, pts, jnp.zeros((5, 1)))),
        np.asarray(freq_encode(pts, 4)), atol=1e-6)


def test_factory_unknown_type():
    import pytest

    with pytest.raises(ValueError, match="unknown encoder type"):
        get_encoder({"type": "nope"})
