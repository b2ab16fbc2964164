"""img_fit: 2D image regression MLP (the CPU-runnable baby workload).

Parity: reference ``src/models/img_fit/network.py`` — uv (2ch) freq-encoded
with 10 freqs (-> 42ch), D=4 W=128 ReLU MLP, sigmoid RGB head.
Config surface: configs/img_fit/lego_view0.yaml.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from .encoders import freq_encode, freq_out_dim
from .nerf_mlp import _linear_init


def init_img_fit_mlp(
    key, D: int = 4, W: int = 128, input_dim: int = 2, num_freqs: int = 10,
    dtype=jnp.float32,
) -> Dict[str, Any]:
    in_ch = freq_out_dim(input_dim, num_freqs)
    keys = jax.random.split(key, D + 1)
    layers = []
    dim = in_ch
    for i in range(D):
        layers.append(_linear_init(keys[i], dim, W, dtype))
        dim = W
    return {"layers": layers, "head": _linear_init(keys[D], W, 3, dtype)}


def apply_img_fit_mlp(
    params: Dict[str, Any], uv: jnp.ndarray, num_freqs: int = 10,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """uv: [..., 2] in [0,1]^2 -> rgb [..., 3] in (0,1)."""
    h = freq_encode(uv, num_freqs)

    def dense(p, h):
        w = p["w"].astype(compute_dtype)
        y = jnp.dot(h.astype(compute_dtype), w, preferred_element_type=jnp.float32)
        return y + p["b"]

    for layer in params["layers"]:
        h = jax.nn.relu(dense(layer, h))
    return jax.nn.sigmoid(dense(params["head"], h))
