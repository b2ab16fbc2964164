"""Camera ray generation.

Parity: reference ``volume_renderer.py:120-140`` — pixel grid, camera-space
dirs [(i-cx)/fx, -(j-cy)/fy, -1], rotate by c2w R, origin = c2w t, then
NORMALIZE rays_d (the reference normalizes before rendering, :140).
"""
from __future__ import annotations

import jax.numpy as jnp


def pixel_dirs(i: jnp.ndarray, j: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Camera-space ray directions for pixel coords (i=x/col, j=y/row).

    K: [3,3] intrinsics with fx=K[0,0], fy=K[1,1], cx=K[0,2], cy=K[1,2].
    """
    return jnp.stack(
        [(i - K[0, 2]) / K[0, 0], -(j - K[1, 2]) / K[1, 1], -jnp.ones_like(i)],
        axis=-1,
    )


def rays_for_pixels(
    i: jnp.ndarray, j: jnp.ndarray, K: jnp.ndarray, c2w: jnp.ndarray,
    normalize: bool = True,
):
    """Rays for arbitrary pixel coordinates.

    i, j: [...] pixel x / y coords (float). c2w: [4,4] or [3,4] pose.
    Returns (rays_o, rays_d): [..., 3].
    """
    dirs = pixel_dirs(i, j, K)  # [..., 3]
    # world dir = R @ dir;  sum over the camera axis
    rays_d = jnp.sum(dirs[..., None, :] * c2w[:3, :3], axis=-1)
    if normalize:
        rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def image_rays(H: int, W: int, K: jnp.ndarray, c2w: jnp.ndarray, normalize: bool = True):
    """All rays of an HxW image, flattened row-major to [H*W, 3]."""
    j, i = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    rays_o, rays_d = rays_for_pixels(i, j, K, c2w, normalize=normalize)
    return rays_o.reshape(-1, 3), rays_d.reshape(-1, 3)
