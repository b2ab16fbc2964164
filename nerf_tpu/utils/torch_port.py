"""Port reference PyTorch checkpoints into this framework's param pytrees.

Parity surface: reference checkpoint format (``src/utils/net_utils.py:288``):
``{net: state_dict, optim, scheduler, recorder, epoch}`` where the network
state_dict carries the coarse model under ``model.`` and the fine model
under ``model_fine.`` prefixes (``src/models/nerf/network.py:142-159``).
Used by the parity harness to assert image/gradient allclose against
torch-trained weights.
"""
from __future__ import annotations

from typing import Any, Dict

from ..models.nerf_mlp import load_torch_state_dict


def strip_prefix(state_dict: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """state-dict prefix surgery (net_utils.py:382-415 analog)."""
    out = {}
    for k, v in state_dict.items():
        if k.startswith(prefix):
            out[k[len(prefix):]] = v
    return out


def load_reference_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference ``.pth`` -> {"coarse": params, "fine": params}."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("net", ckpt)
    # unwrap DDP prefix if present
    if any(k.startswith("module.") for k in sd):
        sd = strip_prefix(sd, "module.")
    coarse_sd = strip_prefix(sd, "model.")
    fine_sd = strip_prefix(sd, "model_fine.")
    return {
        "coarse": load_torch_state_dict(coarse_sd),
        "fine": load_torch_state_dict(fine_sd),
    }
