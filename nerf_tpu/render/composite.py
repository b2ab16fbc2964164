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


def composite(
    raw: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    *,
    raw_noise_std: float = 0.0,
    noise_key=None,
    white_bkgd: bool = True,
    ert_threshold: Optional[float] = None,
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

    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)  # [N, S]

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
