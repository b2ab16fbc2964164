"""Checkpoint I/O round-trip + torch-reference checkpoint porting."""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from nerf_tpu.models.encoders import freq_encode
from nerf_tpu.models.nerf_mlp import apply_nerf_mlp
from nerf_tpu.render.renderer import RenderOptions
from nerf_tpu.train.checkpoint import (
    load_checkpoint, load_params, save_checkpoint,
)
from nerf_tpu.train.loop import init_nerf_params
from nerf_tpu.train.optim import make_optimizer
from nerf_tpu.train.state import init_state
from nerf_tpu.config import default_cfg
from nerf_tpu.utils.torch_port import load_reference_checkpoint

import oracle_torch as oracle


def test_save_load_roundtrip(tmp_path):
    opts = RenderOptions(compute_dtype="float32")
    params = init_nerf_params(jax.random.PRNGKey(0), opts)
    tx = make_optimizer(default_cfg())
    state = init_state(params, tx)
    save_checkpoint(str(tmp_path), state, epoch=7, recorder_state={"step": 3})
    out = load_checkpoint(str(tmp_path), state)
    assert out is not None
    state2, epoch, rec = out
    assert epoch == 7 and rec["step"] == 3
    l1, _ = jax.tree_util.tree_flatten(state)
    l2, _ = jax.tree_util.tree_flatten(state2)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_keep_pruning(tmp_path):
    opts = RenderOptions(compute_dtype="float32")
    params = init_nerf_params(jax.random.PRNGKey(0), opts)
    tx = make_optimizer(default_cfg())
    state = init_state(params, tx)
    for ep in range(8):
        save_checkpoint(str(tmp_path), state, epoch=ep, keep=5)
    import os

    numeric = sorted(int(f[:-4]) for f in os.listdir(tmp_path)
                     if f.endswith(".npz") and f[:-4].isdigit())
    assert numeric == [3, 4, 5, 6, 7]
    assert (tmp_path / "latest.npz").exists()


def test_load_params_weights_only(tmp_path):
    opts = RenderOptions(compute_dtype="float32")
    params = init_nerf_params(jax.random.PRNGKey(1), opts)
    tx = make_optimizer(default_cfg())
    save_checkpoint(str(tmp_path), init_state(params, tx), epoch=0)
    template = init_nerf_params(jax.random.PRNGKey(2), opts)
    loaded = load_params(str(tmp_path), template)
    np.testing.assert_array_equal(
        np.asarray(loaded["coarse"]["pts_linears"][0]["w"]),
        np.asarray(params["coarse"]["pts_linears"][0]["w"]),
    )


def test_torch_reference_checkpoint_port(tmp_path):
    """Port a reference-format .pth ({net: {model.* , model_fine.*}}) and
    verify identical forward outputs."""
    torch.manual_seed(0)
    mc, mf = oracle.OracleNeRF(), oracle.OracleNeRF()
    sd = {}
    for prefix, m in (("model.", mc), ("model_fine.", mf)):
        for k, v in m.state_dict().items():
            sd[prefix + k] = v
    path = str(tmp_path / "latest.pth")
    torch.save({"net": sd, "epoch": 41}, path)

    params = load_reference_checkpoint(path)
    x = np.random.RandomState(0).randn(8, 90).astype(np.float32)
    got = np.asarray(
        apply_nerf_mlp(jax.tree_util.tree_map(jnp.asarray, params["fine"]),
                       jnp.asarray(x), input_ch=63,
                       compute_dtype=jnp.float32))
    with torch.no_grad():
        want = mf(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_load_weights_from_keras():
    """Original TF-NeRF keras weight list -> param pytree (reference
    network.py:76-123 analog; keras kernels are [in, out] = our layout)."""
    import numpy as np

    from nerf_tpu.models.nerf_mlp import apply_nerf_mlp, load_weights_from_keras

    rng = np.random.RandomState(0)
    D, W, in_ch, in_views = 8, 32, 63, 27
    dims = []
    for i in range(D):
        fan_in = in_ch if i == 0 else (W + in_ch if i == 5 else W)
        dims.append((fan_in, W))
    dims += [(W, W), (W + in_views, W // 2), (W // 2, 3), (W, 1)]
    weights = []
    for fi, fo in dims:
        weights.append(rng.randn(fi, fo).astype(np.float32))
        weights.append(rng.randn(fo).astype(np.float32))

    params = load_weights_from_keras(weights, D=D)
    # layout checks: keras kernel goes in untransposed
    np.testing.assert_array_equal(
        np.asarray(params["pts_linears"][0]["w"]), weights[0])
    np.testing.assert_array_equal(
        np.asarray(params["alpha_linear"]["w"]), weights[2 * (D + 3)])
    # the loaded tree drives the MLP end to end
    x = rng.randn(5, in_ch + in_views).astype(np.float32)
    out = apply_nerf_mlp(params, x, input_ch=in_ch, skips=(4,),
                         use_viewdirs=True)
    assert out.shape == (5, 4)
    assert np.isfinite(np.asarray(out)).all()
