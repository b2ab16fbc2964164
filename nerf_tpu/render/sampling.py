"""Stratified and inverse-CDF importance sampling along rays.

Parity targets:
- ``_sample_coarse``  (reference volume_renderer.py:218-237): linspace
  near->far (or lindisp), stratified jitter in the mid-point bins.
- ``_sample_fine``    (reference volume_renderer.py:239-268): pdf from
  weights[...,1:-1] + 1e-5, cdf with leading zero, searchsorted(right),
  deterministic linspace u at eval / uniform u at train, denom<1e-5 -> 1.
  NOTE: like the reference (and unlike the original NeRF), the weights are
  NOT detached — gradient flows through the CDF.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_coarse(
    key,
    n_rays: int,
    n_samples: int,
    near: float,
    far: float,
    perturb: float = 1.0,
    lindisp: bool = False,
) -> jnp.ndarray:
    """Returns z_vals [n_rays, n_samples]."""
    t_vals = jnp.linspace(0.0, 1.0, n_samples)
    if not lindisp:
        z_vals = near * (1.0 - t_vals) + far * t_vals
    else:
        z_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)
    z_vals = jnp.broadcast_to(z_vals, (n_rays, n_samples))
    if perturb > 0.0:
        z_vals = stratify(key, z_vals)
    return z_vals


def stratify(key, z_vals: jnp.ndarray) -> jnp.ndarray:
    """Stratified jitter within the mid-point bins of ``z_vals``."""
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
    lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
    t_rand = jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
    return lower + (upper - lower) * t_rand


def sample_pdf(
    key,
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    n_importance: int,
    deterministic: bool,
    u: jnp.ndarray = None,
) -> jnp.ndarray:
    """Inverse-CDF sampling.

    bins: [N, M] mid-point bin positions; weights: [N, M] (NOT detached).
    ``u``: optional [N, n_importance] override of the sample positions
    (for cross-framework parity checks with injected sample streams).
    Returns samples [N, n_importance].
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [N, M+1]

    if u is not None:
        u = jnp.asarray(u, dtype=cdf.dtype)
    elif deterministic:
        u = jnp.linspace(0.0, 1.0, n_importance, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, (*cdf.shape[:-1], n_importance))
    else:
        u = jax.random.uniform(key, (*cdf.shape[:-1], n_importance), dtype=cdf.dtype)

    # searchsorted(right) per ray, vectorized
    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    # bins has one fewer entry than cdf; clamp like the reference's gather
    # (above can index cdf's last slot; the reference gathers t_mids expanded
    # to cdf's width which clamps implicitly via index bounds — we clamp).
    bmax = bins.shape[-1] - 1
    bins_below = jnp.take_along_axis(bins, jnp.minimum(below, bmax), axis=-1)
    bins_above = jnp.take_along_axis(bins, jnp.minimum(above, bmax), axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)
