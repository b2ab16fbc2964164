#!/usr/bin/env python
"""Port a reference PyTorch checkpoint into this framework's format.

Usage:
    python scripts/port_torch_checkpoint.py --cfg_file configs/nerf/lego.yaml \
        path/to/latest.pth [other cfg overrides...]

Reads the reference ``{net, optim, scheduler, recorder, epoch}`` .pth
(net_utils.py:288-343), converts the coarse+fine MLP weights to this
framework's pytree layout (utils/torch_port.py), wraps them in a fresh
TrainState (optimizer state re-initialized — Adam moments are not ported),
and writes ``latest.npz`` into ``cfg.trained_model_dir`` so ``run.py
--type evaluate`` / ``train.py resume True`` pick it up directly.
"""
import os
import sys

# runnable as `python scripts/port_torch_checkpoint.py` from the repo root
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    pth_path = None
    for i, a in enumerate(argv):
        if a.endswith(".pth"):
            pth_path = argv.pop(i)
            break
    if pth_path is None or not os.path.exists(pth_path):
        print("usage: port_torch_checkpoint.py --cfg_file <yaml> <ckpt.pth> "
              "[overrides...]  (checkpoint file not found)")
        sys.exit(1)

    from nerf_tpu.config import parse_args

    cfg, _ = parse_args(argv)

    import torch

    from nerf_tpu.render.renderer import RenderOptions
    from nerf_tpu.train.checkpoint import save_checkpoint
    from nerf_tpu.train.optim import make_optimizer
    from nerf_tpu.train.state import init_state
    from nerf_tpu.utils.torch_port import load_reference_checkpoint

    opts = RenderOptions.from_cfg(cfg)
    params = load_reference_checkpoint(pth_path)
    w0 = params["coarse"]["pts_linears"][0]["w"]
    expected_in = opts.input_ch
    if w0.shape[0] != expected_in:
        print(f"WARNING: checkpoint input width {w0.shape[0]} != config "
              f"input_ch {expected_in} — config/encoder mismatch?")

    raw = torch.load(pth_path, map_location="cpu", weights_only=False)
    epoch = int(raw.get("epoch", 0)) if isinstance(raw, dict) else 0

    state = init_state(params, make_optimizer(cfg))
    out_dir = cfg.trained_model_dir
    save_checkpoint(out_dir, state, epoch)
    print(f"ported {pth_path} (epoch {epoch}) -> {out_dir}/latest.npz")


if __name__ == "__main__":
    main()
