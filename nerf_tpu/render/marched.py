"""Blockwise ray-marching renderer with transmittance carry.

The TPU-native analog of the reference's multi-pass CUDA pipeline
(SURVEY.md §3.4 / §5): ``generate_query_indices_on_ray`` marches rays in
resumable passes with per-ray state (active mask, depth index), and
``integrate`` carries transmittance across passes. Here the sample axis is
processed as a ``lax.scan`` over fixed-size blocks with carry
(T, rgb, depth, acc); per-ray early termination (ERT) and empty-space
skipping (ESS) are masks on each block's network evaluation, and per-ray
bbox entry/exit clips the marched range (rays missing the scene render
pure background without any network work).

Compared to the hierarchical renderer this is the fast-inference mode:
fixed-step marching (no importance pass), constant VMEM per block
regardless of total sample count.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from . import occupancy as occ
from .composite import density_activation
from .renderer import (
    RenderOptions, compaction_capacity, get_query_fn, query_masked_compacted,
)


def ray_aabb(rays_o, rays_d, bbox_min, bbox_max, near, far):
    """Per-ray [enter, exit] of the bbox clamped to [near, far]."""
    inv = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-10,
                          jnp.where(rays_d < 0, -1e-10, 1e-10), rays_d)
    t0 = (bbox_min - rays_o) * inv
    t1 = (bbox_max - rays_o) * inv
    t_enter = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_exit = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (t_exit >= t_enter) & (t_exit > 0)
    t_enter = jnp.clip(t_enter, near, far)
    t_exit = jnp.clip(t_exit, near, far)
    return t_enter, t_exit, hit


def render_rays_marched(
    params: Dict[str, Any],
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    key: jax.Array,
    opts: RenderOptions,
    grid: Optional[occ.OccupancyGrid] = None,
    n_blocks: int = 16,
    block_samples: int = 16,
    model: str = "fine",
    query_fn: Optional[Callable] = None,
    refocus: bool = True,
) -> Dict[str, jnp.ndarray]:
    """March n_blocks x block_samples fixed-dt samples per ray.

    ``refocus``: probe the occupancy grid along [t_enter, t_exit] and march
    only the [first, last]-occupied span of each ray (the marched-path
    analog of ESS refocusing, occupancy.sample_coarse_with_ess) — the same
    sample budget lands at a ~2-4x finer step where the scene actually is.
    The reference's DDA likewise advances through occupied voxels only
    (generate_inputs.cu:60-193); here the span is contiguous so shapes stay
    static.

    Returns rgb_map/depth_map/acc_map/disp_map [N(,3)].
    """
    if query_fn is None:
        query_fn = get_query_fn(opts)
    n = rays_o.shape[0]
    viewdirs = rays_d if opts.use_viewdirs else None

    if grid is not None:
        bb_min, bb_max = grid.bbox_min, grid.bbox_max
    else:
        bb_min = jnp.full((3,), -2.0)
        bb_max = jnp.full((3,), 2.0)
    t_enter, t_exit, hit = ray_aabb(rays_o, rays_d, bb_min, bb_max,
                                    opts.near, opts.far)
    if refocus and grid is not None:
        n_probe = 64
        tp = jnp.linspace(0.0, 1.0, n_probe)
        zp = t_enter[:, None] * (1.0 - tp) + t_exit[:, None] * tp  # [n, P]
        probe_occ = occ.query(
            grid, rays_o[:, None, :] + rays_d[:, None, :] * zp[..., None])
        has_occ = jnp.any(probe_occ, axis=-1)
        big = jnp.float32(1e10)
        pad = (t_exit - t_enter) / (n_probe - 1)  # one probe interval
        z_lo = jnp.min(jnp.where(probe_occ, zp, big), axis=-1) - pad
        z_hi = jnp.max(jnp.where(probe_occ, zp, -big), axis=-1) + pad
        t_enter = jnp.where(has_occ, jnp.maximum(z_lo, t_enter), t_enter)
        t_exit = jnp.where(has_occ, jnp.minimum(z_hi, t_exit), t_exit)
        # ADVICE r4: a structure thinner than one probe interval can slip
        # between all 64 probes; keep ``hit`` unchanged so such rays fall
        # back to the full unrefocused span (per-sample ESS still skips
        # their empty samples) instead of compositing to pure background.
    total = n_blocks * block_samples
    dt = (t_exit - t_enter) / total  # [n]

    def block(carry, b_idx):
        T, rgb_acc, depth_acc, acc = carry
        # this block's samples: [n, K]
        s = b_idx * block_samples + jnp.arange(block_samples)
        z = t_enter[:, None] + (s[None, :] + 0.5) * dt[:, None]
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]

        active = (T >= opts.ert_threshold) & hit if opts.enable_ert else hit
        sample_mask = active[:, None]
        if opts.enable_ess and grid is not None:
            sample_mask = sample_mask & occ.query(grid, pts)
        else:
            sample_mask = jnp.broadcast_to(sample_mask, pts.shape[:2])

        p = params[model] if model in params else params
        if opts.ess_compaction > 0.0:
            # unified ESS+ERT compaction: the block's mask already folds in
            # terminated rays and empty voxels, so the fixed-capacity gather
            # converts BOTH optimizations into real FLOP savings (the
            # reference's compact-then-evaluate DDA pipeline, SURVEY §3.4)
            cap = compaction_capacity(
                pts.shape[0] * pts.shape[1], opts.ess_compaction)
            raw = query_masked_compacted(
                query_fn, p, pts, viewdirs, opts, sample_mask, cap)
        else:
            raw = query_fn(p, pts, viewdirs, opts)
        sigma = jnp.where(
            sample_mask,
            density_activation(raw[..., 3], opts.sigma_activation), 0.0)
        rgb = jax.nn.sigmoid(raw[..., :3])

        alpha = 1.0 - jnp.exp(-sigma * dt[:, None])
        # transmittance WITHIN the block (exclusive), carried across blocks
        log1ma = jnp.log(1.0 - alpha + 1e-10)
        excl = jnp.concatenate(
            [jnp.zeros_like(log1ma[:, :1]),
             jnp.cumsum(log1ma[:, :-1], axis=-1)], axis=-1)
        w = alpha * T[:, None] * jnp.exp(excl)

        rgb_acc = rgb_acc + jnp.sum(w[..., None] * rgb, axis=1)
        depth_acc = depth_acc + jnp.sum(w * z, axis=1)
        acc = acc + jnp.sum(w, axis=1)
        T = T * jnp.exp(jnp.sum(log1ma, axis=-1))
        return (T, rgb_acc, depth_acc, acc), None

    init = (
        jnp.ones((n,)), jnp.zeros((n, 3)), jnp.zeros((n,)), jnp.zeros((n,)),
    )
    (T, rgb_map, depth_map, acc_map), _ = jax.lax.scan(
        block, init, jnp.arange(n_blocks))

    if opts.white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])
    disp_map = 1.0 / jnp.maximum(1e-10,
                                 depth_map / jnp.maximum(acc_map, 1e-10))
    return {"rgb_map": rgb_map, "depth_map": depth_map, "acc_map": acc_map,
            "disp_map": disp_map, "transmittance": T}


@partial(jax.jit, static_argnames=("H", "W", "opts", "n_blocks",
                                   "block_samples", "tile", "refocus"))
def render_image_marched(
    params, pose, intrinsics, key, H: int, W: int, opts: RenderOptions,
    grid=None, n_blocks: int = 16, block_samples: int = 16,
    tile: int = 16384, refocus: bool = True,
):
    """Whole-image fixed-step marching via lax.map over ray tiles."""
    from .rays import image_rays

    rays_o, rays_d = image_rays(H, W, intrinsics, pose)
    n = H * W
    t = min(tile, n)
    n_pad = (-n) % t
    rays_o = jnp.pad(rays_o, ((0, n_pad), (0, 0)))
    rays_d = jnp.pad(rays_d, ((0, n_pad), (0, 0)), constant_values=1.0)
    n_tiles = (n + n_pad) // t

    def tile_fn(args):
        ro, rd = args
        out = render_rays_marched(params, ro, rd, key, opts, grid=grid,
                                  n_blocks=n_blocks,
                                  block_samples=block_samples,
                                  refocus=refocus)
        return {k: v for k, v in out.items() if k != "transmittance"}

    out = jax.lax.map(tile_fn, (rays_o.reshape(n_tiles, t, 3),
                                rays_d.reshape(n_tiles, t, 3)))
    ret = {}
    for k, v in out.items():
        flat = v.reshape(n_tiles * t, *v.shape[2:])[:n]
        ret[k] = flat.reshape(H, W, 3) if k == "rgb_map" else flat.reshape(H, W)
    return ret
