"""Expert-parallel KiloNeRF: tiny networks sharded across the device mesh.

SURVEY.md §2.9 — the reference's many-small-MLPs mode is MoE-shaped
(queries routed to per-voxel networks); on a multi-chip TPU slice the
networks shard across devices and queries travel over ICI with
``all_to_all``. This module implements that as a ``shard_map``:

1. points are data-sharded [P/D per device]; each device computes its
   points' voxel/network ids and their DESTINATION device (networks are
   blocked contiguously: device d owns ids [d*G/D, (d+1)*G/D));
2. capacity-based dispatch packs points into a [D, C_send, ...] buffer,
   ``all_to_all`` exchanges it (the EP analog of the reference sorting
   queries by network, reorder.cu);
3. each device routes its received points among its LOCAL networks and
   evaluates them as one batched einsum (multimatmul.cu analog);
4. results ``all_to_all`` home and scatter back to point order.

Static shapes throughout; overflow points degrade to sigma=0 exactly like
the single-device path.
"""
from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
try:
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.kilonerf import (
    KiloConfig, _dispatch, assign_networks, global_to_local, mlp_grouped,
    n_networks,
)


def shard_kilonerf_params(params: Dict, mesh: Mesh, axis: str = "data"):
    """Place each layer's [G, ...] stacks sharded over the mesh axis."""
    spec = jax.sharding.NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, spec), params)


@partial(jax.jit, static_argnames=("cfg", "mesh", "axis", "send_capacity",
                                   "expert_capacity"))
def kilonerf_eval_ep(
    params: Dict,
    pts: jnp.ndarray,
    dirs: jnp.ndarray,
    cfg: KiloConfig,
    mesh: Mesh,
    axis: str = "data",
    send_capacity: int = 0,
    expert_capacity: int = 0,
) -> jnp.ndarray:
    """pts, dirs [P, 3] (P divisible by mesh size) -> raw [P, 4].

    params: the usual KiloNeRF pytree with leading G axis, sharded (or
    shardable) over ``axis``. Equals ``kilonerf_eval`` where capacities
    suffice; overflow points return zeros. ``cfg.dispatch_rounds`` is NOT
    honored here (single-round only) — match dense eval by sizing
    ``send_capacity``/``expert_capacity`` instead of rounds.
    """
    D = mesh.shape[axis]
    G = n_networks(cfg)
    if G % D:
        raise ValueError(f"G={G} networks not divisible by {D} devices")
    G_loc = G // D
    P_pts = pts.shape[0]
    if P_pts % D:
        raise ValueError(f"P={P_pts} points not divisible by {D} devices")
    P_loc = P_pts // D
    if send_capacity <= 0:
        send_capacity = max(8, int(cfg.capacity_factor * P_loc / D))
    if expert_capacity <= 0:
        expert_capacity = max(
            8, int(cfg.capacity_factor * D * send_capacity / G_loc))

    def shard_fn(p_loc, pts_l, dirs_l):
        ids = assign_networks(pts_l, cfg)              # [P_loc] global ids
        local = global_to_local(pts_l, ids, cfg)
        dest = (ids // G_loc).astype(jnp.int32)        # owner device

        # pack into [D, C_send, ...] by destination (reorder.cu analog)
        slot, gather_idx, slot_valid = _dispatch(dest, D, send_capacity)
        flat_gi = gather_idx.reshape(-1)

        def pack(x):
            return x[flat_gi].reshape(D, send_capacity, *x.shape[1:])

        send_x = jnp.where(slot_valid[..., None], pack(local), 0.0)
        send_d = jnp.where(slot_valid[..., None], pack(dirs_l), 0.0)
        send_id = jnp.where(slot_valid, pack(ids % G_loc), G_loc)  # G_loc=pad

        # exchange over ICI: slice d of send goes to device d
        def a2a(x):
            return jax.lax.all_to_all(x, axis, 0, 0, tiled=True)

        recv_x, recv_d = a2a(send_x), a2a(send_d)
        recv_id = a2a(send_id)

        # route received points among the LOCAL networks
        flat_x = recv_x.reshape(D * send_capacity, 3)
        flat_d = recv_d.reshape(D * send_capacity, 3)
        flat_id = recv_id.reshape(-1)                  # G_loc marks padding
        l_slot, l_gidx, l_valid = _dispatch(flat_id, G_loc, expert_capacity)
        # padding ids (== G_loc) dispatch out of range -> dropped by design
        xg = flat_x[l_gidx.reshape(-1)].reshape(G_loc, expert_capacity, 3)
        dg = flat_d[l_gidx.reshape(-1)].reshape(G_loc, expert_capacity, 3)
        raw_slots = mlp_grouped(p_loc, xg, dg, cfg)
        raw_slots = jnp.where(l_valid[..., None], raw_slots, 0.0)

        # un-route to received order, then all_to_all home
        raw_flat = jnp.zeros((D * send_capacity, 4), raw_slots.dtype)
        flat_tgt = jnp.where(l_valid.reshape(-1), l_gidx.reshape(-1),
                             D * send_capacity)
        raw_flat = raw_flat.at[flat_tgt].set(
            raw_slots.reshape(-1, 4), mode="drop")
        raw_home = a2a(raw_flat.reshape(D, send_capacity, 4))

        # un-pack to point order
        ok = slot >= 0
        out = jnp.where(
            ok[:, None],
            raw_home[dest, jnp.clip(slot, 0, send_capacity - 1)],
            0.0,
        )
        return out

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )
    return fn(params, pts, dirs)
