"""Hash-variant encoders for dynamic scenes (4d / latent / coef / motion2d)."""
import numpy as np
import jax
import jax.numpy as jnp

from nerf_tpu.models.hash_variants import (
    hash4d_encode, hash_coef_encode, hash_latent_encode, init_hash4d,
    init_hash_coef, init_hash_latent, init_motion2d, motion2d_encode,
)

KW = dict(n_levels=4, n_features=2, log2_table_size=10,
          base_resolution=4, per_level_scale=2.0)
ENC_KW = dict(base_resolution=4, per_level_scale=2.0)


def _xyzt(n=32, seed=0):
    rng = np.random.RandomState(seed)
    xyz = rng.uniform(-2, 2, (n, 3))
    t = rng.randint(0, 10, (n, 1))
    return jnp.asarray(np.concatenate([xyz, t], -1), jnp.float32)


def test_hash4d():
    p = init_hash4d(jax.random.PRNGKey(0), **KW)
    out = hash4d_encode(p, _xyzt(), num_frames=10, **ENC_KW)
    assert out.shape == (32, 8)
    # time matters: same xyz at different t gives different features
    a = _xyzt()
    b = a.at[:, 3].set(a[:, 3] + 1)
    fa = hash4d_encode(p, a, num_frames=10, **ENC_KW)
    fb = hash4d_encode(p, b, num_frames=10, **ENC_KW)
    assert np.abs(np.asarray(fa - fb)).max() > 0


def test_hash_latent():
    p = init_hash_latent(jax.random.PRNGKey(1), num_frames=10, latent_dim=8,
                         **KW)
    out = hash_latent_encode(p, _xyzt(), **ENC_KW)
    assert out.shape == (32, 8 + 8)
    # last 8 dims equal the frame latent
    t0 = int(_xyzt()[0, 3])
    np.testing.assert_allclose(np.asarray(out[0, 8:]),
                               np.asarray(p["latent_t"][t0]))


def test_hash_coef():
    p = init_hash_coef(jax.random.PRNGKey(2), basis_num=3, **KW)
    out = hash_coef_encode(p, _xyzt(), num_frames=10, **ENC_KW)
    assert out.shape == (32, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_motion2d_canonical_vs_deformed():
    p = init_motion2d(jax.random.PRNGKey(3), mlp_width=16, mlp_depth=2, **KW)
    x = _xyzt()
    x0 = x.at[:, 3].set(0.0)   # canonical frame: no deformation
    x1 = x.at[:, 3].set(5.0)
    f0 = motion2d_encode(p, x0, num_frames=10, **ENC_KW)
    f1 = motion2d_encode(p, x1, num_frames=10, **ENC_KW)
    assert f0.shape == (32, 24)
    assert np.abs(np.asarray(f0 - f1)).max() > 0  # deformation changed lookups


def test_gradients_flow_everywhere():
    p = init_hash_coef(jax.random.PRNGKey(4), basis_num=2, **KW)
    x = _xyzt(16)

    def loss(q):
        return jnp.sum(hash_coef_encode(q, x, num_frames=10, **ENC_KW) ** 2)

    g = jax.grad(loss)(p)
    assert (np.asarray(g["bases"][0]["table"]) != 0).any()
    assert (np.asarray(g["coef_l1"]["w"]) != 0).any()
