"""Hand-written Pallas backward vs XLA autodiff (interpret mode, f32)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_tpu.models.nerf_mlp import init_nerf_mlp
from nerf_tpu.ops import fused_mlp
from nerf_tpu.render.renderer import RenderOptions


@pytest.fixture()
def setup(monkeypatch):
    monkeypatch.setattr(fused_mlp, "INTERPRET", True)
    monkeypatch.setattr(fused_mlp, "BACKWARD", "pallas")
    opts = RenderOptions(compute_dtype="float32", use_pallas=True)
    params = init_nerf_mlp(jax.random.PRNGKey(5), input_ch=63,
                           input_ch_views=27)
    rng = np.random.RandomState(5)
    pts = jnp.asarray(rng.randn(640, 3).astype(np.float32))  # > tile=512
    dirs_ = rng.randn(640, 3).astype(np.float32)
    dirs_ /= np.linalg.norm(dirs_, axis=-1, keepdims=True)
    return opts, params, pts, jnp.asarray(dirs_), rng


def test_all_param_grads_match(setup):
    opts, params, pts, dirs, rng = setup
    g_out = jnp.asarray(rng.randn(640, 4).astype(np.float32))

    def loss_pallas(p, x, d):
        return jnp.sum(fused_mlp.fused_nerf_eval_diff(p, x, d, opts) * g_out)

    def loss_xla(p, x, d):
        return jnp.sum(fused_mlp._xla_reference(p, x, d, opts) * g_out)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(params, pts, dirs)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(params, pts, dirs)

    flat_p, _ = jax.tree_util.tree_flatten_with_path(gp[0])
    flat_x, _ = jax.tree_util.tree_flatten_with_path(gx[0])
    for (path, vp), (_, vx) in zip(flat_p, flat_x):
        scale = max(1e-3, float(jnp.max(jnp.abs(vx))))
        np.testing.assert_allclose(
            np.asarray(vp), np.asarray(vx), atol=2e-4 * scale + 1e-6,
            err_msg=f"param grad mismatch at {jax.tree_util.keystr(path)}",
        )
    # input gradients
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gx[1]),
                               atol=1e-3, err_msg="dpts")
    np.testing.assert_allclose(np.asarray(gp[2]), np.asarray(gx[2]),
                               atol=1e-3, err_msg="ddirs")
