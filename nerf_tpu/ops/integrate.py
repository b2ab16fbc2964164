"""Pallas compositing (volume integration) kernel.

TPU-native analog of the reference's ``cuda/integrate.cu`` (per-ray
sequential alpha compositing with running transmittance + ERT): one grid
step composites a tile of rays entirely in VMEM. The per-ray scan over
samples is expressed as a lane-axis cumulative product in log space
(exclusive transmittance T_i = exp(cumsum_{j<i} log(1 - a_j + 1e-10))),
matching ``render/composite.py`` math; ERT is the monotone-T mask.

Layout: the sample axis is the minor (lane) dimension; rgb is passed as
[T, 3, S] so every array keeps S lanes.
"""
from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _integrate_kernel(ert_ref, sigma_ref, rgb_ref, z_ref, dnorm_ref,
                      rgb_map_ref, depth_ref, acc_ref, weights_ref,
                      *, sigma_activation: str = "relu"):
    f32 = jnp.float32
    sigma = sigma_ref[:]          # [T, S] raw density
    z = z_ref[:]                  # [T, S]
    dnorm = dnorm_ref[:]          # [T, 1] ||rays_d||

    dists = jnp.concatenate(
        [z[:, 1:] - z[:, :-1], jnp.full_like(z[:, :1], 1e10)], axis=-1)
    dists = dists * dnorm

    if sigma_activation == "relu":
        dens = jnp.maximum(sigma, 0.0)
    else:  # softplus, in the exp/log/max subset that lowers on Pallas-TPU:
        # softplus(x) = max(x, 0) + log(1 + exp(-|x|))
        dens = jnp.maximum(sigma, 0.0) + jnp.log(1.0 + jnp.exp(-jnp.abs(sigma)))
    lam = dens * dists
    alpha = 1.0 - jnp.exp(-lam)
    # log(1 - alpha + 1e-10) = log(exp(-lam) + 1e-10) = logaddexp, computed
    # stably and with exp/log/max only (expm1/log1p/logaddexp have no
    # Pallas-TPU lowering). The naive form cancels catastrophically: XLA
    # reassociates the +1e-10 into the 1.0, yielding log(0) = -inf, which
    # turns the masked dot below into 0 * -inf = NaN.
    log_eps = jnp.float32(-23.025850929940457)  # log(1e-10)
    hi = jnp.maximum(-lam, log_eps)
    lo = jnp.minimum(-lam, log_eps)
    log_1ma = hi + jnp.log(1.0 + jnp.exp(lo - hi))
    # exclusive cumsum over the lane axis. jnp.cumsum has no Pallas-TPU
    # lowering; a matmul with a strictly-lower-triangular ones mask is the
    # MXU-native formulation: excl[:, i] = sum_{j<i} log_1ma[:, j].
    S = log_1ma.shape[-1]
    row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    excl_mask = (row < col).astype(f32)
    excl = jax.lax.dot(log_1ma, excl_mask,
                       preferred_element_type=f32,
                       precision=jax.lax.Precision.HIGHEST)
    trans = jnp.exp(excl)
    weights = alpha * trans

    ert = ert_ref[0]
    weights = jnp.where(
        ert > 0, weights * (trans >= ert).astype(f32), weights)

    rgb = jax.nn.sigmoid(rgb_ref[:])              # [T, 3, S]
    rgb_map_ref[:] = jnp.sum(rgb * weights[:, None, :], axis=-1)
    depth_ref[:] = jnp.sum(weights * z, axis=-1, keepdims=True)
    acc_ref[:] = jnp.sum(weights, axis=-1, keepdims=True)
    weights_ref[:] = weights


@partial(jax.jit, static_argnames=("tile", "white_bkgd", "interpret",
                                   "sigma_activation"))
def integrate_pallas(
    sigma: jnp.ndarray,     # [N, S] raw density
    rgb_raw: jnp.ndarray,   # [N, S, 3]
    z_vals: jnp.ndarray,    # [N, S]
    rays_d: jnp.ndarray,    # [N, 3]
    ert_threshold: float = 0.0,   # 0 = ERT off
    white_bkgd: bool = True,
    tile: int = 1024,
    interpret: bool = False,
    sigma_activation: str = "relu",
) -> Dict[str, jnp.ndarray]:
    N, S = sigma.shape
    n_pad = (-N) % tile
    if n_pad:
        sigma = jnp.pad(sigma, ((0, n_pad), (0, 0)))
        rgb_raw = jnp.pad(rgb_raw, ((0, n_pad), (0, 0), (0, 0)))
        z_vals = jnp.pad(z_vals, ((0, n_pad), (0, 0)), constant_values=1.0)
        rays_d = jnp.pad(rays_d, ((0, n_pad), (0, 0)), constant_values=1.0)
    Np = N + n_pad
    n_tiles = Np // tile

    rgb_t = jnp.moveaxis(rgb_raw, -1, 1)  # [Np, 3, S] keeps S on lanes
    dnorm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    ert = jnp.full((1,), ert_threshold, jnp.float32)

    out = pl.pallas_call(
        partial(_integrate_kernel, sigma_activation=sigma_activation),
        out_shape=(
            jax.ShapeDtypeStruct((Np, 3), jnp.float32),   # rgb_map (pre-bg)
            jax.ShapeDtypeStruct((Np, 1), jnp.float32),   # depth
            jax.ShapeDtypeStruct((Np, 1), jnp.float32),   # acc
            jax.ShapeDtypeStruct((Np, S), jnp.float32),   # weights
        ),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(ert, sigma, rgb_t, z_vals, dnorm)

    rgb_map, depth, acc, weights = out
    rgb_map = rgb_map[:N]
    depth = depth[:N, 0]
    acc = acc[:N, 0]
    weights = weights[:N]
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc[:, None])
    disp = 1.0 / jnp.maximum(1e-10, depth / jnp.maximum(acc, 1e-10))
    return {"rgb_map": rgb_map, "depth_map": depth, "acc_map": acc,
            "disp_map": disp, "weights": weights}


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _composite_pallas_diff(raw, z_vals, rays_d, white_bkgd, ert_threshold,
                           sigma_activation, tile, interpret):
    """Differentiable compositing: Pallas kernel forward, recompute-XLA
    backward (the same math via ``render.composite.composite``). The
    backward is a handful of elementwise ops + one cumsum over S — a
    negligible slice of a train step, so recompute (not a hand-written
    Pallas backward) is the right trade here; grad parity is tested in
    test_integrate_kernel.py. Mirrors ``cuda/integrate.cu:9-57`` which the
    reference likewise only uses forward (its training never touches the
    CUDA path) — here it is legal in training too."""
    return integrate_pallas(
        raw[..., 3], raw[..., :3], z_vals, rays_d,
        ert_threshold=ert_threshold, white_bkgd=white_bkgd,
        tile=tile, interpret=interpret, sigma_activation=sigma_activation,
    )


def _xla_composite_math(raw, z_vals, rays_d, white_bkgd, ert_threshold,
                        sigma_activation):
    from ..render.composite import composite

    out = composite(
        raw, z_vals, rays_d, white_bkgd=white_bkgd,
        ert_threshold=None if ert_threshold <= 0 else ert_threshold,
        sigma_activation=sigma_activation,
    )
    return {k: out[k] for k in
            ("rgb_map", "depth_map", "acc_map", "disp_map", "weights")}


def _composite_fwd(raw, z_vals, rays_d, white_bkgd, ert_threshold,
                   sigma_activation, tile, interpret):
    out = _composite_pallas_diff(raw, z_vals, rays_d, white_bkgd,
                                 ert_threshold, sigma_activation, tile,
                                 interpret)
    return out, (raw, z_vals, rays_d)


def _composite_bwd(white_bkgd, ert_threshold, sigma_activation, tile,
                   interpret, res, g):
    raw, z_vals, rays_d = res
    _, vjp = jax.vjp(
        lambda r, z, d: _xla_composite_math(
            r, z, d, white_bkgd, ert_threshold, sigma_activation),
        raw, z_vals, rays_d,
    )
    return vjp(g)


_composite_pallas_diff.defvjp(_composite_fwd, _composite_bwd)


def composite_pallas(
    raw: jnp.ndarray,       # [N, S, 4] (rgb_raw, sigma_raw)
    z_vals: jnp.ndarray,    # [N, S]
    rays_d: jnp.ndarray,    # [N, 3]
    *,
    white_bkgd: bool = True,
    ert_threshold: float = 0.0,
    sigma_activation: str = "relu",
    tile: int = 1024,
    interpret: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Drop-in for ``render.composite.composite`` (noise-free).

    Same output surface minus ``transmittance`` (unused downstream).
    Differentiable: custom VJP recomputes the XLA composite backward.
    """
    return _composite_pallas_diff(
        raw, z_vals, rays_d, white_bkgd, ert_threshold, sigma_activation,
        tile, interpret,
    )
