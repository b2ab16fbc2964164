"""Triplane encoder tests."""
import numpy as np
import jax
import jax.numpy as jnp

from nerf_tpu.models.triplane import (
    init_triplane, triplane_encode, triplane_out_dim,
)


def test_shapes_and_dim():
    p = init_triplane(jax.random.PRNGKey(0), resolution=16, n_features=4)
    pts = jnp.asarray(np.random.RandomState(0).uniform(-2, 2, (32, 3)),
                      jnp.float32)
    out = triplane_encode(p, pts)
    assert out.shape == (32, triplane_out_dim(4))


def test_exact_at_grid_nodes():
    p = init_triplane(jax.random.PRNGKey(1), resolution=5, n_features=2)
    # point exactly at grid node (i,j,k) = (2,3,1) of a 5-grid on [-2,2]
    pt = jnp.asarray([[-2 + 4 * 2 / 4, -2 + 4 * 3 / 4, -2 + 4 * 1 / 4]])
    out = np.asarray(triplane_encode(p, pt))[0]
    planes = np.asarray(p["planes"])
    want = np.concatenate([planes[0, 2, 3], planes[1, 2, 1], planes[2, 3, 1]])
    np.testing.assert_allclose(out, want, atol=1e-6)


def test_gradients():
    p = init_triplane(jax.random.PRNGKey(2), resolution=8, n_features=2)
    pts = jnp.asarray(np.random.RandomState(1).uniform(-1, 1, (16, 3)),
                      jnp.float32)
    g = jax.grad(lambda q: jnp.sum(triplane_encode(q, pts) ** 2))(p)
    gp = np.asarray(g["planes"])
    assert np.isfinite(gp).all() and (gp != 0).any()
