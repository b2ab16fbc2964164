"""Sharded train step: numerics must not depend on the mesh size.

The data-parallel claim in one test: running the SAME global batch on a
1-device mesh and an N-device mesh must produce the same loss and the same
updated parameters (up to accumulation-order noise) — i.e. sharding + the
XLA-inserted gradient psum preserve semantics.

Each parametrized case computes its own 1-device reference inside the test
(round-2 verdict: the previous cross-case function-attribute cache silently
became a no-op under -k selection or reordering).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_tpu.config import default_cfg
from nerf_tpu.parallel.mesh import make_mesh, replicate
from nerf_tpu.parallel.train_step import make_sharded_train_step
from nerf_tpu.render.renderer import RenderOptions
from nerf_tpu.train.loop import init_nerf_params
from nerf_tpu.train.optim import make_optimizer
from nerf_tpu.train.state import init_state


def _run_sharded_step(devices):
    """One sharded train step on a ``devices``-wide mesh -> (loss, weight)."""
    opts = RenderOptions(
        n_samples=8, n_importance=8, compute_dtype="float32",
        enable_ess=False, enable_ert=False, use_pallas=False,
    )
    cfg = default_cfg()
    tx = make_optimizer(cfg)
    rng = np.random.RandomState(0)
    H = W = 32
    images = jnp.asarray(rng.randint(0, 256, (2, H, W, 3), np.uint8))
    poses = jnp.broadcast_to(jnp.eye(4).at[2, 3].set(4.0), (2, 4, 4))
    K = jnp.asarray([[40.0, 0, 16], [0, 40.0, 16], [0, 0, 1]], jnp.float32)
    n_rays = 64  # global batch, divisible by every mesh size

    mesh = make_mesh(devices)
    params = init_nerf_params(jax.random.PRNGKey(0), opts)
    state = replicate(mesh, init_state(params, tx))
    step = make_sharded_train_step(mesh, tx, opts, n_rays)
    state, stats = step(
        state, replicate(mesh, images), replicate(mesh, poses),
        replicate(mesh, K), jax.random.PRNGKey(7), None)

    loss = float(stats["loss"])
    w = np.asarray(state.params["coarse"]["pts_linears"][0]["w"])
    return loss, w


def test_single_device_step_finite():
    loss, w = _run_sharded_step(1)
    assert np.isfinite(loss)
    assert np.all(np.isfinite(w))


@pytest.mark.parametrize("devices", [2, 8])
def test_mesh_size_invariance(devices):
    if len(jax.devices()) < devices:
        pytest.skip("not enough devices")
    ref_loss, ref_w = _run_sharded_step(1)
    loss, w = _run_sharded_step(devices)
    assert abs(loss - ref_loss) < 1e-5, (loss, ref_loss)
    np.testing.assert_allclose(w, ref_w, atol=1e-6)


def _run_full_loop(devices, workspace):
    """The REAL trainer (train/loop.py) on a ``devices``-device mesh."""
    import __graft_entry__ as ge
    from nerf_tpu.train.loop import train

    cfg = ge.dryrun_tiny_cfg(devices, workspace)
    cfg.task_arg.N_rays = 64  # same global batch for every mesh size
    state, _ = train(cfg)
    return np.asarray(state.params["coarse"]["pts_linears"][0]["w"])


def test_full_loop_mesh_invariance(tmp_path):
    """The REAL trainer (train/loop.py) on a 1-device vs 8-device mesh must
    produce the same trained parameters — i.e. `python train.py` is now a
    distributed program whose numerics don't depend on the mesh size."""
    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    ref_w = _run_full_loop(1, str(tmp_path / "ws1"))
    assert np.all(np.isfinite(ref_w))
    w = _run_full_loop(8, str(tmp_path / "ws8"))
    np.testing.assert_allclose(w, ref_w, atol=2e-5)
