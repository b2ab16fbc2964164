"""D-NeRF style time-conditioned deformation field.

Parity surface: reference ``src/models/encoding/dnerf.py`` (time-conditioned
deformation MLP) and the ``dnerf_ngp_*`` variants (deformation in front of a
spatial encoder): x_canonical = x + MLP(freq(x), freq(t)); the canonical
point then feeds any spatial encoder (frequency / hashgrid / triplane).
"""
from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

from .encoders import freq_encode, freq_out_dim
from .nerf_mlp import _linear_init


def init_deformation(
    key,
    D: int = 4,
    W: int = 128,
    xyz_freqs: int = 10,
    time_freqs: int = 4,
) -> Dict[str, Any]:
    in_ch = freq_out_dim(3, xyz_freqs) + freq_out_dim(1, time_freqs)
    keys = jax.random.split(key, D + 1)
    layers = []
    dim = in_ch
    for i in range(D):
        layers.append(_linear_init(keys[i], dim, W))
        dim = W
    head = _linear_init(keys[D], W, 3)
    # zero-init the head so deformation starts as identity
    head = {"w": jnp.zeros_like(head["w"]), "b": jnp.zeros_like(head["b"])}
    return {"layers": layers, "head": head}


def apply_deformation(
    params: Dict[str, Any], pts: jnp.ndarray, t: jnp.ndarray,
    xyz_freqs: int = 10, time_freqs: int = 4,
) -> jnp.ndarray:
    """pts: [N, 3], t: scalar or [N] in [0,1] -> deformed pts [N, 3].

    t=0 is the canonical frame (deformation forced to zero), matching the
    D-NeRF convention. Freq counts are static args (kept out of the param
    pytree so optimizers/grads never see integers).
    """
    t = jnp.broadcast_to(jnp.asarray(t, pts.dtype).reshape(-1, 1),
                         (pts.shape[0], 1))
    h = jnp.concatenate(
        [freq_encode(pts, xyz_freqs),
         freq_encode(t, time_freqs)], axis=-1)
    for layer in params["layers"]:
        h = jax.nn.relu(h @ layer["w"] + layer["b"])
    dx = h @ params["head"]["w"] + params["head"]["b"]
    dx = jnp.where(t > 0, dx, 0.0)  # canonical frame at t=0
    return pts + dx


def deformed_encoder(
    deform_params: Dict[str, Any],
    spatial_encode: Callable[[jnp.ndarray], jnp.ndarray],
    xyz_freqs: int = 10, time_freqs: int = 4,
):
    """Compose deformation with any spatial encoder: f(x, t) =
    spatial_encode(x + Δ(x, t)) — the dnerf_ngp_* pattern."""

    def encode(pts: jnp.ndarray, t) -> jnp.ndarray:
        return spatial_encode(
            apply_deformation(deform_params, pts, t, xyz_freqs, time_freqs))

    return encode
