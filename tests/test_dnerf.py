"""D-NeRF deformation field tests."""
import numpy as np
import jax
import jax.numpy as jnp

from nerf_tpu.models.dnerf import (
    apply_deformation, deformed_encoder, init_deformation,
)
from nerf_tpu.models.encoders import freq_encode


def test_identity_at_init_and_t0():
    p = init_deformation(jax.random.PRNGKey(0))
    pts = jnp.asarray(np.random.RandomState(0).randn(16, 3), jnp.float32)
    # zero-initialized head -> identity at any t
    out = apply_deformation(p, pts, 0.7)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-7)
    # t=0 canonical even with nonzero head
    p["head"]["b"] = jnp.ones(3)
    np.testing.assert_allclose(
        np.asarray(apply_deformation(p, pts, 0.0)), np.asarray(pts), atol=1e-7)
    assert np.abs(np.asarray(apply_deformation(p, pts, 0.5)) - np.asarray(pts)).max() > 0.5


def test_composed_encoder_and_grads():
    p = init_deformation(jax.random.PRNGKey(1), D=2, W=32)
    p["head"]["b"] = jnp.full((3,), 0.1)
    enc = deformed_encoder(p, lambda x: freq_encode(x, 4))
    pts = jnp.asarray(np.random.RandomState(1).randn(8, 3), jnp.float32)
    out = enc(pts, 0.5)
    assert out.shape == (8, 27)

    def loss(q):
        return jnp.sum(deformed_encoder(q, lambda x: freq_encode(x, 4))(pts, 0.5) ** 2)

    g = jax.grad(loss)(p)
    # with the identity-init (zero) head, hidden-layer grads are zero until
    # the head moves — head grads must be live immediately
    gh = np.asarray(g["head"]["w"])
    assert np.isfinite(gh).all() and (gh != 0).any()
