"""Tri-plane factored encoder.

Parity surface: reference ``src/models/encoding/triplane.py`` (Plane/
TriPlane hash-plane factorization): three axis-aligned feature planes
(XY, XZ, YZ), bilinear interpolation, features combined by concatenation.
Pure JAX: plane lookups are gathers; gradients scatter-add into the planes.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def init_triplane(
    key,
    resolution: int = 128,
    n_features: int = 16,
    init_scale: float = 1e-2,
) -> Dict:
    """{planes: [3, R, R, F]} — order (XY, XZ, YZ)."""
    planes = jax.random.normal(
        key, (3, resolution, resolution, n_features), jnp.float32
    ) * init_scale
    return {"planes": planes}


def _bilinear(plane: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """plane: [R, R, F]; uv: [N, 2] in [0,1] -> [N, F]."""
    R = plane.shape[0]
    xy = jnp.clip(uv, 0.0, 1.0) * (R - 1)
    x0 = jnp.floor(xy).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, R - 1)
    t = xy - x0
    f00 = plane[x0[:, 0], x0[:, 1]]
    f01 = plane[x0[:, 0], x1[:, 1]]
    f10 = plane[x1[:, 0], x0[:, 1]]
    f11 = plane[x1[:, 0], x1[:, 1]]
    tx, ty = t[:, :1], t[:, 1:2]
    return (
        f00 * (1 - tx) * (1 - ty)
        + f01 * (1 - tx) * ty
        + f10 * tx * (1 - ty)
        + f11 * tx * ty
    )


def triplane_encode(
    params: Dict,
    pts: jnp.ndarray,
    bbox_min: float = -2.0,
    bbox_max: float = 2.0,
) -> jnp.ndarray:
    """pts: [N, 3] -> [N, 3*F] (concat of the three plane features)."""
    x = (pts - bbox_min) / (bbox_max - bbox_min)
    planes = params["planes"]
    f_xy = _bilinear(planes[0], x[:, (0, 1)])
    f_xz = _bilinear(planes[1], x[:, (0, 2)])
    f_yz = _bilinear(planes[2], x[:, (1, 2)])
    return jnp.concatenate([f_xy, f_xz, f_yz], axis=-1)


def triplane_out_dim(n_features: int = 16) -> int:
    return 3 * n_features
