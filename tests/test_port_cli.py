"""Port-CLI round trip: reference .pth -> framework checkpoint -> eval load."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def _torch_nerf_state_dict(torch, D=8, W=256, input_ch=63, input_ch_views=27):
    sd = {}
    g = torch.Generator().manual_seed(0)

    def lin(i, o):
        return (torch.randn(o, i, generator=g) * 0.05,
                torch.randn(o, generator=g) * 0.05)

    dims_in = [input_ch] + [W + (input_ch if i == 5 else 0)
                            for i in range(1, D)]
    for i, din in enumerate(dims_in):
        w, b = lin(din, W)
        sd[f"model.pts_linears.{i}.weight"] = w
        sd[f"model.pts_linears.{i}.bias"] = b
    for name, (din, dout) in {
        "feature_linear": (W, W), "alpha_linear": (W, 1),
        "rgb_linear": (W // 2, 3),
    }.items():
        w, b = lin(din, dout)
        sd[f"model.{name}.weight"] = w
        sd[f"model.{name}.bias"] = b
    w, b = lin(W + input_ch_views, W // 2)
    sd["model.views_linears.0.weight"] = w
    sd["model.views_linears.0.bias"] = b
    # fine model: same shapes, different values
    for k in list(sd):
        if k.startswith("model."):
            sd["model_fine." + k[len("model."):]] = sd[k] + 0.01
    return sd


def test_port_torch_checkpoint_cli(tmp_path, monkeypatch):
    import torch

    sd = _torch_nerf_state_dict(torch)
    pth = tmp_path / "latest.pth"
    torch.save({"net": sd, "epoch": 123}, str(pth))

    import port_torch_checkpoint

    monkeypatch.chdir(os.path.join(os.path.dirname(__file__), ".."))
    ws = tmp_path / "ws"
    port_torch_checkpoint.main([
        "--cfg_file", "configs/nerf/lego.yaml",
        str(pth), "workspace", str(ws),
    ])

    # the ported checkpoint loads through the standard eval path
    import jax

    from nerf_tpu.config import make_cfg
    from nerf_tpu.render.renderer import RenderOptions
    from nerf_tpu.train.checkpoint import load_checkpoint, load_params
    from nerf_tpu.train.loop import init_nerf_params

    cfg = make_cfg("configs/nerf/lego.yaml", ["workspace", str(ws)])
    opts = RenderOptions.from_cfg(cfg)
    template = init_nerf_params(jax.random.PRNGKey(0), opts)
    params = load_params(cfg.trained_model_dir, template)
    assert params is not None
    np.testing.assert_allclose(
        np.asarray(params["coarse"]["pts_linears"][0]["w"]),
        sd["model.pts_linears.0.weight"].numpy().T, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["fine"]["rgb_linear"]["w"]),
        sd["model_fine.rgb_linear.weight"].numpy().T, atol=1e-6)

    # epoch metadata survives (resume continues after the ported epoch)
    from nerf_tpu.train.optim import make_optimizer
    from nerf_tpu.train.state import init_state

    state_t = init_state(template, make_optimizer(cfg))
    _, epoch, _ = load_checkpoint(cfg.trained_model_dir, state_t)
    assert epoch == 123
