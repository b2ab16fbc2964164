"""Sharded train step: rays over the ``data`` mesh axis, params replicated.

The analog of the reference's DDP step (trainer.py:47-60): forward renders a
ray batch, loss = MSE(coarse)+MSE(fine), backward, grad clip 40, Adam. Here
the batch's leading dim is sharded over the mesh; because params are
replicated, XLA inserts the gradient all-reduce (psum over ICI) during
backward — the DDP bucketed all-reduce equivalent, scheduled by the
compiler to overlap with remaining backward compute.
"""
from __future__ import annotations

from typing import Optional

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..render.occupancy import OccupancyGrid
from ..render.renderer import RenderOptions
from ..train.state import TrainState, nerf_loss, sample_ray_batch


def make_sharded_train_step(
    mesh: Mesh,
    tx: optax.GradientTransformation,
    opts: RenderOptions,
    n_rays: int,
    axis: str = "data",
):
    """Returns a jitted step: (state, images_u8, poses, K, key, grid) ->
    (state, stats). ``n_rays`` is the GLOBAL batch size (must divide by the
    mesh size)."""
    ray_sharding = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def step(state: TrainState, images_u8, poses, intrinsics, key,
             grid: Optional[OccupancyGrid]):
        k_batch, k_render = jax.random.split(jax.random.fold_in(key, state.step))
        rays_o, rays_d, target = sample_ray_batch(
            k_batch, images_u8, poses, intrinsics, n_rays
        )
        # pin the ray batch to the data axis: all downstream per-ray compute
        # shards; the grad psum materializes at the params (replicated)
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

    return jax.jit(
        step,
        donate_argnums=(0,),
        out_shardings=(rep, rep),  # prefix: whole state / stats replicated
    )
