"""Alpha compositing (volume rendering integration).

Parity: reference ``_raw2outputs`` (volume_renderer.py:286-357):
    dists tail 1e10, dists scaled by ||rays_d||, rgb = sigmoid(raw[...,:3]),
    alpha = 1 - exp(-relu(sigma + noise) * dists),
    weights = alpha * exclusive_cumprod(1 - alpha + 1e-10),
    disp = 1 / max(1e-10, depth / acc),  white-bg: rgb += (1 - acc).

ERT (early ray termination) parity target ``_raw2outputs_with_ert``
(volume_renderer.py:1089-1157): zero weights from the first sample whose
incoming transmittance drops below ``ert_threshold``. Because transmittance
is monotone non-increasing, this is exactly the mask ``T >= threshold``.
The reference's implementation has an argmax bug that zeroes ALL weights of
rays that never terminate (argmax of an all-False row is 0); we implement the
intended behavior (documented divergence, see SURVEY.md §7.3).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def density_activation(sigma: jnp.ndarray, kind: str = "relu") -> jnp.ndarray:
    """raw sigma -> nonnegative density.

    "relu" is reference parity (volume_renderer.py:288). "softplus" is the
    non-dying alternative required by hash-encoder models: their features
    start ~1e-4 so the ReLU preactivation is essentially the bias, and the
    white-background gradient pushes it negative within a few hundred steps
    — after which relu'(σ_raw)=0 for every point and training is dead
    (observed on lego_hashgrid: both models collapse to all-empty/white).
    softplus(x)=log1p(exp(x)) underflows to exactly 0 for large negative x,
    so masked/compacted samples filled with a large negative raw still
    composite as exactly empty (needed for the 1e10 tail dist).
    """
    if kind == "relu":
        return jax.nn.relu(sigma)
    if kind == "softplus":
        return jax.nn.softplus(sigma)
    raise ValueError(f"unknown sigma activation: {kind!r}")


# raw sigma fill for masked-out samples: maps to exactly-zero density under
# every activation (relu(-1e4)=0; softplus(-1e4) underflows to 0)
EMPTY_SIGMA_RAW = -1e4


def composite(
    raw: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    *,
    raw_noise_std: float = 0.0,
    noise_key=None,
    white_bkgd: bool = True,
    ert_threshold: Optional[float] = None,
    sigma_activation: str = "relu",
) -> Dict[str, jnp.ndarray]:
    """raw: [N, S, 4] (rgb_raw, sigma_raw); z_vals: [N, S]; rays_d: [N, 3].

    Returns dict with rgb_map [N,3], disp_map, acc_map, depth_map [N],
    weights [N, S], transmittance [N, S].
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
    )
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    rgb = jax.nn.sigmoid(raw[..., :3])

    sigma = raw[..., 3]
    if raw_noise_std > 0.0 and noise_key is not None:
        sigma = sigma + jax.random.normal(noise_key, sigma.shape) * raw_noise_std

    alpha = 1.0 - jnp.exp(-density_activation(sigma, sigma_activation) * dists)

    # exclusive cumprod of (1 - alpha + 1e-10): transmittance arriving at i
    trans = jnp.cumprod(
        jnp.concatenate(
            [jnp.ones_like(alpha[..., :1]), 1.0 - alpha[..., :-1] + 1e-10], axis=-1
        ),
        axis=-1,
    )
    weights = alpha * trans

    if ert_threshold is not None:
        # intended ERT: drop contributions once transmittance < threshold
        weights = weights * (trans >= ert_threshold).astype(weights.dtype)

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / jnp.maximum(acc_map, 1e-10))

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    return {
        "rgb_map": rgb_map,
        "disp_map": disp_map,
        "acc_map": acc_map,
        "depth_map": depth_map,
        "weights": weights,
        "transmittance": trans,
    }
