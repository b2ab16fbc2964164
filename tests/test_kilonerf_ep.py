"""Expert-parallel KiloNeRF (8-device CPU mesh): all-to-all routing must
reproduce the single-device batched evaluation."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from nerf_tpu.ops.kilonerf import KiloConfig, init_kilonerf, kilonerf_eval
from nerf_tpu.parallel.kilonerf_ep import (
    kilonerf_eval_ep, shard_kilonerf_params,
)


def _mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]), ("data",))


def _inputs(cfg, P=512, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.uniform(cfg.bbox_min, cfg.bbox_max, (P, 3)).astype(np.float32)
    d = rng.randn(P, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(pts), jnp.asarray(d)


def test_ep_matches_dense():
    mesh = _mesh()
    cfg = KiloConfig(grid_size=4, hidden=16)  # 64 networks / 8 devices
    params = init_kilonerf(jax.random.PRNGKey(0), cfg)
    pts, dirs = _inputs(cfg)

    want = np.asarray(kilonerf_eval(params, pts, dirs, cfg, capacity=512))
    p_sharded = shard_kilonerf_params(params, mesh)
    got = np.asarray(kilonerf_eval_ep(
        p_sharded, pts, dirs, cfg, mesh,
        send_capacity=512, expert_capacity=512))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_ep_overflow_degrades_to_empty():
    """Tight send capacity drops points to sigma=0 instead of corrupting."""
    mesh = _mesh()
    cfg = KiloConfig(grid_size=2, hidden=8)  # 8 networks / 8 devices
    params = init_kilonerf(jax.random.PRNGKey(1), cfg)
    pts, dirs = _inputs(cfg, P=256, seed=1)

    dense = np.asarray(kilonerf_eval(params, pts, dirs, cfg, capacity=256))
    tight = np.asarray(kilonerf_eval_ep(
        params, pts, dirs, cfg, mesh, send_capacity=8, expert_capacity=256))
    # every row is either the dense result or exactly zero
    is_zero = np.all(tight == 0.0, axis=-1)
    np.testing.assert_allclose(tight[~is_zero], dense[~is_zero],
                               rtol=2e-5, atol=2e-5)
    assert is_zero.any()  # capacity 8/dev over 32 pts/dev must drop some
    assert not is_zero.all()


def test_ep_differentiable():
    mesh = _mesh()
    cfg = KiloConfig(grid_size=2, hidden=8)
    params = init_kilonerf(jax.random.PRNGKey(2), cfg)
    pts, dirs = _inputs(cfg, P=64, seed=2)

    def loss_ep(p):
        return jnp.sum(kilonerf_eval_ep(
            p, pts, dirs, cfg, mesh,
            send_capacity=64, expert_capacity=128) ** 2)

    def loss_dense(p):
        return jnp.sum(kilonerf_eval(p, pts, dirs, cfg, capacity=64) ** 2)

    g_ep = jax.grad(loss_ep)(params)
    g_dense = jax.grad(loss_dense)(params)
    for k in g_ep:
        np.testing.assert_allclose(np.asarray(g_ep[k]["w"]),
                                   np.asarray(g_dense[k]["w"]),
                                   rtol=1e-4, atol=1e-4)
