"""Fused Pallas MLP kernel vs the XLA reference path (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from nerf_tpu.models.encoders import freq_encode
from nerf_tpu.models.nerf_mlp import apply_nerf_mlp, init_nerf_mlp
from nerf_tpu.ops.fused_mlp import fused_nerf_eval, repack_params, supports
from nerf_tpu.render.renderer import RenderOptions


def test_fused_matches_xla():
    params = init_nerf_mlp(jax.random.PRNGKey(0), input_ch=63, input_ch_views=27)
    kp = repack_params(params, weight_dtype=jnp.float32)
    rng = np.random.RandomState(0)
    P = 512
    pts = jnp.asarray(rng.randn(P, 3).astype(np.float32))
    d = rng.randn(P, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dirs = jnp.asarray(d)

    got = fused_nerf_eval(kp, pts, dirs, tile=256, interpret=True)
    emb = jnp.concatenate([freq_encode(pts, 10), freq_encode(dirs, 4)], -1)
    want = apply_nerf_mlp(params, emb, input_ch=63, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_fused_padding():
    """Non-multiple-of-tile point counts are padded and unpadded correctly."""
    params = init_nerf_mlp(jax.random.PRNGKey(1), input_ch=63, input_ch_views=27)
    kp = repack_params(params, weight_dtype=jnp.float32)
    rng = np.random.RandomState(1)
    P = 300  # < tile and not a multiple
    pts = jnp.asarray(rng.randn(P, 3).astype(np.float32))
    dirs = jnp.asarray(rng.randn(P, 3).astype(np.float32))
    got = fused_nerf_eval(kp, pts, dirs, tile=256, interpret=True)
    assert got.shape == (P, 4)
    emb = jnp.concatenate([freq_encode(pts, 10), freq_encode(dirs, 4)], -1)
    want = apply_nerf_mlp(params, emb, input_ch=63, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_supports_gate():
    assert supports(RenderOptions())
    assert not supports(RenderOptions(mlp_width=128))
    assert not supports(RenderOptions(skips=(2,)))


def test_diff_wrapper_grads_match_xla(monkeypatch):
    """custom VJP: pallas forward (interpret), recompute-XLA backward."""
    from nerf_tpu.ops import fused_mlp

    monkeypatch.setattr(fused_mlp, "INTERPRET", True)
    opts = RenderOptions(compute_dtype="float32", use_pallas=True)
    params = init_nerf_mlp(jax.random.PRNGKey(3), input_ch=63,
                           input_ch_views=27)
    rng = np.random.RandomState(3)
    pts = jnp.asarray(rng.randn(128, 3).astype(np.float32))
    dirs = jnp.asarray(rng.randn(128, 3).astype(np.float32))
    g_out = jnp.asarray(rng.randn(128, 4).astype(np.float32))

    def loss_fused(p):
        return jnp.sum(fused_mlp.fused_nerf_eval_diff(p, pts, dirs, opts) * g_out)

    def loss_xla(p):
        return jnp.sum(fused_mlp._xla_reference(p, pts, dirs, opts) * g_out)

    vf, gf = jax.value_and_grad(loss_fused)(params)
    vx, gx = jax.value_and_grad(loss_xla)(params)
    assert abs(float(vf) - float(vx)) < 1e-2
    np.testing.assert_allclose(
        np.asarray(gf["rgb_linear"]["w"]), np.asarray(gx["rgb_linear"]["w"]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(gf["pts_linears"][0]["w"]),
        np.asarray(gx["pts_linears"][0]["w"]), atol=1e-5,
    )
