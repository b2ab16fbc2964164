"""Train state + the jitted NeRF train step (on-device ray batching).

The TPU-native replacement for the reference's host DataLoader + DDP loop:
images (uint8) and poses live on device; each step samples (image, pixel)
indices with the JAX PRNG, gathers targets, generates rays, renders, and
applies the gradient — one compiled program, zero host<->device traffic.

Loss parity: MSE(coarse) + MSE(fine), psnr = -10*log10(mse_fine)
(reference src/train/trainers/nerf.py:39-76).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..render.occupancy import OccupancyGrid
from ..render.rays import rays_for_pixels
from ..render.renderer import RenderOptions, render_rays


class TrainState(NamedTuple):
    params: Dict[str, Any]
    opt_state: Any
    step: jnp.ndarray  # scalar int32


def init_state(params: Dict[str, Any], tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def nerf_loss(
    params: Dict[str, Any],
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    target: jnp.ndarray,
    key: jax.Array,
    opts: RenderOptions,
    grid: Optional[OccupancyGrid],
):
    # query dispatch lives in the renderer (get_query_fn): on TPU with
    # opts.use_pallas this is the fused Pallas kernel pair — forward
    # (ops/fused_mlp.py) + hand-written Pallas backward via its custom VJP
    # (ops/fused_mlp_bwd.py, grad-parity tested in test_fused_bwd.py)
    out = render_rays(params, rays_o, rays_d, key, opts, grid=grid, train=True)
    loss_coarse = jnp.mean((out["rgb_map_0"] - target) ** 2)
    stats = {"loss_coarse": loss_coarse}
    loss = loss_coarse
    if "rgb_map" in out:
        mse_fine = jnp.mean((out["rgb_map"] - target) ** 2)
        stats["loss_fine"] = mse_fine
        loss = loss + mse_fine
        psnr_mse = mse_fine
    else:
        psnr_mse = loss_coarse
    stats["psnr"] = -10.0 * jnp.log10(psnr_mse)
    stats["loss"] = loss
    return loss, stats


def sample_ray_batch(
    key: jax.Array,
    images_u8: jnp.ndarray,  # [N, H, W, 3] uint8
    poses: jnp.ndarray,  # [N, 4, 4]
    intrinsics: jnp.ndarray,  # [3, 3]
    n_rays: int,
    step: Optional[jnp.ndarray] = None,
    precrop_iters: int = 0,
    precrop_frac: float = 0.5,
):
    """Uniformly sample n_rays (image, pixel) pairs and build rays + targets.

    Precrop warmup (the original-NeRF trick the reference declares but never
    wires up — lego.yaml:26-27, unused per SURVEY §7.3): while
    ``step < precrop_iters``, pixels are drawn from the central
    ``precrop_frac`` crop only, so early optimization sees the object rather
    than mostly white background. Traced as a ``jnp.where`` on the pixel
    coordinates — legal inside the scanned train step.
    """
    n_img, H, W, _ = images_u8.shape
    k_img, k_pix = jax.random.split(key)
    img_idx = jax.random.randint(k_img, (n_rays,), 0, n_img)
    if precrop_iters > 0 and step is not None:
        k_row, k_col = jax.random.split(k_pix)
        dH = max(1, int(H // 2 * precrop_frac))
        dW = max(1, int(W // 2 * precrop_frac))
        row_full = jax.random.randint(k_row, (n_rays,), 0, H)
        col_full = jax.random.randint(k_col, (n_rays,), 0, W)
        row_crop = jax.random.randint(
            jax.random.fold_in(k_row, 1), (n_rays,), H // 2 - dH, H // 2 + dH)
        col_crop = jax.random.randint(
            jax.random.fold_in(k_col, 1), (n_rays,), W // 2 - dW, W // 2 + dW)
        use_crop = step < precrop_iters
        row = jnp.where(use_crop, row_crop, row_full)
        col = jnp.where(use_crop, col_crop, col_full)
        pix_idx = row * W + col
    else:
        pix_idx = jax.random.randint(k_pix, (n_rays,), 0, H * W)
    py = (pix_idx // W).astype(jnp.float32)
    px = (pix_idx % W).astype(jnp.float32)
    target = images_u8[img_idx, pix_idx // W, pix_idx % W].astype(jnp.float32) / 255.0
    c2w = poses[img_idx]  # [B, 4, 4]
    rays_o, rays_d = jax.vmap(
        lambda i, j, p: rays_for_pixels(i, j, intrinsics, p)
    )(px, py, c2w)
    return rays_o, rays_d, target


@partial(
    jax.jit,
    static_argnames=("tx", "opts", "n_rays", "n_steps", "mesh",
                     "precrop_iters", "precrop_frac"),
    donate_argnames=("state",),
)
def train_steps(
    state: TrainState,
    images_u8: jnp.ndarray,
    poses: jnp.ndarray,
    intrinsics: jnp.ndarray,
    key: jax.Array,
    tx: optax.GradientTransformation,
    opts: RenderOptions,
    n_rays: int,
    n_steps: int,
    grid: Optional[OccupancyGrid] = None,
    mesh: Optional[Mesh] = None,
    precrop_iters: int = 0,
    precrop_frac: float = 0.5,
):
    """Run ``n_steps`` train steps in one compiled scan (keeps the chip busy;
    stats come back as the mean over the chunk).

    With ``mesh`` set, each step's ray batch is sharded over the mesh's
    ``data`` axis (params replicated) — the data-parallel step of the
    reference's DDP trainer (trainer.py:14-21): all per-ray compute shards,
    and the gradient all-reduce is the psum XLA inserts for the
    replicated-parameter gradients, overlapped with backward."""
    ray_sharding = (
        NamedSharding(mesh, P(mesh.axis_names[0])) if mesh is not None else None
    )

    def body(state, _):
        k = jax.random.fold_in(key, state.step)
        k_batch, k_render = jax.random.split(k)
        rays_o, rays_d, target = sample_ray_batch(
            k_batch, images_u8, poses, intrinsics, n_rays,
            step=state.step, precrop_iters=precrop_iters,
            precrop_frac=precrop_frac,
        )
        if ray_sharding is not None:
            rays_o = jax.lax.with_sharding_constraint(rays_o, ray_sharding)
            rays_d = jax.lax.with_sharding_constraint(rays_d, ray_sharding)
            target = jax.lax.with_sharding_constraint(target, ray_sharding)
        (loss, stats), grads = jax.value_and_grad(nerf_loss, has_aux=True)(
            state.params, rays_o, rays_d, target, k_render, opts, grid
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            stats,
        )

    state, stats = jax.lax.scan(body, state, None, length=n_steps)
    return state, jax.tree_util.tree_map(jnp.mean, stats)


@partial(
    jax.jit,
    static_argnames=("tx", "opts", "H", "W", "tile"),
    donate_argnames=("state",),
)
def train_step_full_image(
    state: TrainState,
    images_u8: jnp.ndarray,
    poses: jnp.ndarray,
    intrinsics: jnp.ndarray,
    key: jax.Array,
    tx: optax.GradientTransformation,
    opts: RenderOptions,
    H: int,
    W: int,
    tile: int = 4096,
    grid: Optional[OccupancyGrid] = None,
):
    """Whole-image training step (the reference's full-image loss semantics,
    trainers/nerf.py:39-76): renders EVERY ray of one randomly chosen image
    with gradients, accumulating grads over static ray tiles via lax.scan
    (naive whole-image backward is memory-infeasible; tile accumulation is
    exact because the loss is a mean over rays)."""
    from ..render.rays import image_rays

    k_img, k_render = jax.random.split(jax.random.fold_in(key, state.step))
    n_img = images_u8.shape[0]
    img_idx = jax.random.randint(k_img, (), 0, n_img)
    c2w = poses[img_idx]
    target_img = images_u8[img_idx].astype(jnp.float32) / 255.0  # [H, W, 3]

    rays_o, rays_d = image_rays(H, W, intrinsics, c2w)
    targets = target_img.reshape(-1, 3)
    n = H * W
    n_pad = (-n) % tile
    rays_o = jnp.pad(rays_o, ((0, n_pad), (0, 0)))
    rays_d = jnp.pad(rays_d, ((0, n_pad), (0, 0)), constant_values=1.0)
    targets = jnp.pad(targets, ((0, n_pad), (0, 0)))
    valid = jnp.pad(jnp.ones((n,), jnp.float32), (0, n_pad))
    n_tiles = (n + n_pad) // tile
    shape3 = (n_tiles, tile, 3)
    rays_o = rays_o.reshape(shape3)
    rays_d = rays_d.reshape(shape3)
    targets = targets.reshape(shape3)
    valid = valid.reshape(n_tiles, tile)

    def tile_loss(params, ro, rd, tgt, v, k):
        out = render_rays(params, ro, rd, k, opts, grid=grid, train=True)
        # per-tile SUM of squared error (averaged over the image at the end)
        se_c = jnp.sum(((out["rgb_map_0"] - tgt) ** 2) * v[:, None])
        rgb_fine = out.get("rgb_map", out["rgb_map_0"])
        se_f = jnp.sum(((rgb_fine - tgt) ** 2) * v[:, None])
        if "rgb_map" not in out:  # coarse-only: don't double-count
            se_f = jnp.zeros_like(se_f)
        return se_c + se_f, (se_c, se_f)

    grad_fn = jax.value_and_grad(tile_loss, has_aux=True)

    def body(carry, inp):
        g_acc, se_c_acc, se_f_acc = carry
        ro, rd, tgt, v, k = inp
        (_, (se_c, se_f)), g = grad_fn(state.params, ro, rd, tgt, v, k)
        g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
        return (g_acc, se_c_acc + se_c, se_f_acc + se_f), None

    zero_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    keys = jax.random.split(k_render, n_tiles)
    (g_sum, se_c, se_f), _ = jax.lax.scan(
        body, (zero_g, 0.0, 0.0),
        (rays_o, rays_d, targets, valid, keys),
    )
    denom = jnp.float32(n * 3)
    grads = jax.tree_util.tree_map(lambda g: g / denom, g_sum)
    loss_coarse = se_c / denom
    loss_fine = se_f / denom
    loss = loss_coarse + loss_fine
    psnr_mse = jnp.where(loss_fine > 0, loss_fine, loss_coarse)
    stats = {
        "loss": loss, "loss_coarse": loss_coarse, "loss_fine": loss_fine,
        "psnr": -10.0 * jnp.log10(psnr_mse),
    }
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), stats


@partial(jax.jit, static_argnames=("tx", "opts", "n_rays"), donate_argnames=("state",))
def train_step(
    state: TrainState,
    images_u8: jnp.ndarray,
    poses: jnp.ndarray,
    intrinsics: jnp.ndarray,
    key: jax.Array,
    tx: optax.GradientTransformation,
    opts: RenderOptions,
    n_rays: int,
    grid: Optional[OccupancyGrid] = None,
):
    k_batch, k_render = jax.random.split(jax.random.fold_in(key, state.step))
    rays_o, rays_d, target = sample_ray_batch(
        k_batch, images_u8, poses, intrinsics, n_rays
    )
    (loss, stats), grads = jax.value_and_grad(nerf_loss, has_aux=True)(
        state.params, rays_o, rays_d, target, k_render, opts, grid
    )
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
    return new_state, stats
