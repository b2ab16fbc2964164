"""The classic NeRF MLP as a pure-functional pytree model.

Architecture parity: reference ``src/models/nerf/network.py:9-74`` —
8x256 ``pts_linears`` with skip-concat of the embedded input AFTER layer 4's
ReLU, viewdir head (alpha_linear 256->1, feature_linear 256->256,
views_linears [256+27 -> 128], rgb_linear 128->3), output [rgb(3), alpha(1)].

Init matches ``torch.nn.Linear`` defaults (U(-1/sqrt(fan_in), 1/sqrt(fan_in))
for both weight and bias) so that torch-trained checkpoints port exactly and
fresh training starts from the same distribution.

Weights are stored transposed relative to torch ([in, out] instead of
[out, in]) — the natural layout for ``x @ W`` on the MXU.
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def _linear_init(key, fan_in: int, fan_out: int, dtype=jnp.float32):
    bound = 1.0 / (fan_in ** 0.5)
    wkey, bkey = jax.random.split(key)
    w = jax.random.uniform(wkey, (fan_in, fan_out), dtype, -bound, bound)
    b = jax.random.uniform(bkey, (fan_out,), dtype, -bound, bound)
    return {"w": w, "b": b}


def init_nerf_mlp(
    key,
    D: int = 8,
    W: int = 256,
    input_ch: int = 63,
    input_ch_views: int = 27,
    skips: Sequence[int] = (4,),
    use_viewdirs: bool = True,
    dtype=jnp.float32,
) -> Params:
    keys = jax.random.split(key, D + 4)
    pts_linears: List[Dict[str, jnp.ndarray]] = []
    in_dim = input_ch
    for i in range(D):
        pts_linears.append(_linear_init(keys[i], in_dim, W, dtype))
        # layer i's output gets input concatenated when i in skips,
        # so layer i+1 sees W + input_ch
        in_dim = W + input_ch if i in skips else W
    params: Params = {"pts_linears": pts_linears}
    if use_viewdirs:
        params["feature_linear"] = _linear_init(keys[D], W, W, dtype)
        params["alpha_linear"] = _linear_init(keys[D + 1], W, 1, dtype)
        params["views_linears"] = [
            _linear_init(keys[D + 2], input_ch_views + W, W // 2, dtype)
        ]
        params["rgb_linear"] = _linear_init(keys[D + 3], W // 2, 3, dtype)
    else:
        params["output_linear"] = _linear_init(keys[D], W, 4, dtype)
    return params


def apply_nerf_mlp(
    params: Params,
    x: jnp.ndarray,
    input_ch: int,
    skips: Sequence[int] = (4,),
    use_viewdirs: bool = True,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """x: [..., input_ch + input_ch_views] -> [..., 4] as [rgb_raw, sigma_raw].

    Matmuls run in ``compute_dtype`` (bfloat16 on TPU for the MXU fast path)
    with float32 accumulation; the returned raw outputs are float32.
    """
    input_pts = x[..., :input_ch]
    input_views = x[..., input_ch:]

    def dense(p, h):
        w = p["w"].astype(compute_dtype)
        y = jnp.dot(h.astype(compute_dtype), w, preferred_element_type=jnp.float32)
        return y + p["b"]

    h = input_pts
    for i, layer in enumerate(params["pts_linears"]):
        h = jax.nn.relu(dense(layer, h))
        if i in skips:
            h = jnp.concatenate([input_pts, h], axis=-1)

    if use_viewdirs:
        alpha = dense(params["alpha_linear"], h)
        feature = dense(params["feature_linear"], h)
        h = jnp.concatenate([feature, input_views], axis=-1)
        for layer in params["views_linears"]:
            h = jax.nn.relu(dense(layer, h))
        rgb = dense(params["rgb_linear"], h)
        return jnp.concatenate([rgb, alpha], axis=-1)
    return dense(params["output_linear"], h)


def load_torch_state_dict(state_dict, D: int = 8, use_viewdirs: bool = True) -> Params:
    """Convert a torch ``NeRF`` state_dict (reference network.py:9) into our
    pytree layout (weights transposed to [in, out])."""
    import numpy as np

    def t(name):
        v = state_dict[name]
        arr = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        return jnp.asarray(arr)

    params: Params = {
        "pts_linears": [
            {"w": t(f"pts_linears.{i}.weight").T, "b": t(f"pts_linears.{i}.bias")}
            for i in range(D)
        ]
    }
    if use_viewdirs:
        params["feature_linear"] = {
            "w": t("feature_linear.weight").T, "b": t("feature_linear.bias")}
        params["alpha_linear"] = {
            "w": t("alpha_linear.weight").T, "b": t("alpha_linear.bias")}
        params["views_linears"] = [{
            "w": t("views_linears.0.weight").T, "b": t("views_linears.0.bias")}]
        params["rgb_linear"] = {
            "w": t("rgb_linear.weight").T, "b": t("rgb_linear.bias")}
    else:
        params["output_linear"] = {
            "w": t("output_linear.weight").T, "b": t("output_linear.bias")}
    return params


def load_weights_from_keras(weights, D: int = 8, use_viewdirs: bool = True) -> Params:
    """Build the param pytree from the original TF-NeRF keras weight list
    (reference ``load_weights_from_keras``, src/models/nerf/network.py:76-123).

    ``weights`` is the flat list from ``np.load(..., allow_pickle=True)`` of
    the original-NeRF TF checkpoints: [kernel, bias] pairs in the order
    pts_linears[0..D-1], feature_linear, views_linears[0], rgb_linear,
    alpha_linear. Keras kernels are already [in, out] — our native layout —
    so unlike the reference (which transposes into torch [out, in]) this is
    a straight copy.
    """
    import numpy as np

    if not use_viewdirs:
        raise ValueError(
            "original TF-NeRF keras checkpoints are viewdir models")

    def pair(idx):
        return (
            jnp.asarray(np.asarray(weights[2 * idx], np.float32)),
            jnp.asarray(np.asarray(weights[2 * idx + 1], np.float32)),
        )

    params: Params = {"pts_linears": []}
    for i in range(D):
        w, b = pair(i)
        params["pts_linears"].append({"w": w, "b": b})
    w, b = pair(D)
    params["feature_linear"] = {"w": w, "b": b}
    w, b = pair(D + 1)
    params["views_linears"] = [{"w": w, "b": b}]
    w, b = pair(D + 2)
    params["rgb_linear"] = {"w": w, "b": b}
    w, b = pair(D + 3)
    params["alpha_linear"] = {"w": w, "b": b}
    return params
