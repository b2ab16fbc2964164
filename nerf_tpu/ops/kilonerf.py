"""KiloNeRF many-small-MLPs mode: voxel-routed tiny networks, TPU-native.

The reference implements this as a CUDA pipeline (SURVEY.md §3.4):
``generate_query_indices_on_ray`` -> ``sort_by_key(network_id)`` ->
``global_to_local`` -> fused smem MLP (``network_eval.cu:25-254``, hidden 32,
one thread block per tiny network) or MAGMA grouped sgemm
(``multimatmul.cu:244-361``) -> ``scatter`` back -> ``integrate``.

TPU-native re-design (MoE-shaped, static shapes):
- a g^3 voxel grid of tiny networks over the scene bbox; each point's
  network id is its voxel (the routing of reorder.cu);
- capacity-based dispatch: every network gets a fixed-capacity slot buffer
  [G, C, in]; points are scattered in by (id, rank-within-id), overflow
  points fall back to zero output (empty space) — the static-shape analog
  of the sort+gather grouping;
- the tiny MLPs run as ONE batched einsum per layer ([G,C,in] x [G,in,out])
  on the MXU — the analog of MAGMA's vbatched sgemm;
- results scatter back to ray order (scatter_int32_float4 analog).

Architecture per network (network_eval.cu:114-241): fourier(pos_local, 10)
-> h(32) -> h(32) -> [sigma(1) | feat(32)] -> concat(feat, fourier(dir, 4))
-> h(32) -> rgb(3). Positions are mapped to the network's local [-1,1] cube
first (global_to_local.cu:8-29).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from ..models.encoders import freq_encode, freq_out_dim
from ..models.nerf_mlp import _linear_init


class KiloConfig(NamedTuple):
    grid_size: int = 16          # g -> G = g^3 networks
    hidden: int = 32
    xyz_freqs: int = 10          # on LOCAL coords
    dir_freqs: int = 4
    bbox_min: float = -2.0
    bbox_max: float = 2.0
    capacity_factor: float = 2.0
    # serving rounds per dispatch: round r serves rank window
    # [r*C, (r+1)*C) of each network, so rounds*C bounds the per-network
    # load actually evaluated (overflow past that renders as empty space)
    dispatch_rounds: int = 1


def n_networks(cfg: KiloConfig) -> int:
    return cfg.grid_size ** 3


def init_kilonerf(key, cfg: KiloConfig) -> Dict:
    G = n_networks(cfg)
    h = cfg.hidden
    in_pos = freq_out_dim(3, cfg.xyz_freqs)   # 63
    in_dir = freq_out_dim(3, cfg.dir_freqs)   # 27
    keys = jax.random.split(key, 5 * G).reshape(5, G, 2)

    def batch_init(ks, fan_in, fan_out):
        ws, bs = [], []
        for g in range(ks.shape[0]):
            p = _linear_init(ks[g], fan_in, fan_out)
            ws.append(p["w"])
            bs.append(p["b"])
        return {"w": jnp.stack(ws), "b": jnp.stack(bs)}

    return {
        "l1": batch_init(keys[0], in_pos, h),
        "l2": batch_init(keys[1], h, h),
        "l3": batch_init(keys[2], h, h + 1),          # [feat | sigma]
        "l4": batch_init(keys[3], h + in_dir, h),
        "l5": batch_init(keys[4], h, 3),
    }


def assign_networks(pts: jnp.ndarray, cfg: KiloConfig) -> jnp.ndarray:
    """pts [P,3] -> network ids [P] (voxel index, x-major)."""
    g = cfg.grid_size
    x = (pts - cfg.bbox_min) / (cfg.bbox_max - cfg.bbox_min)
    v = jnp.clip((x * g).astype(jnp.int32), 0, g - 1)
    return v[..., 0] * g * g + v[..., 1] * g + v[..., 2]


def global_to_local(pts: jnp.ndarray, ids: jnp.ndarray, cfg: KiloConfig) -> jnp.ndarray:
    """Affine map into each network's [-1,1]^3 cube (global_to_local.cu)."""
    g = cfg.grid_size
    cell = (cfg.bbox_max - cfg.bbox_min) / g
    vx = ids // (g * g)
    vy = (ids // g) % g
    vz = ids % g
    corner = cfg.bbox_min + jnp.stack([vx, vy, vz], -1).astype(pts.dtype) * cell
    return (pts - corner) / cell * 2.0 - 1.0


# dispatch rank algorithm: "sort" (global argsort) or "bucketed" (two-level:
# batched per-chunk sorts + cross-chunk count cumsum — replaces one huge 1-D
# TPU sort, the most expensive dispatch stage, with MXU/VPU-friendly batched
# [NB, K] sorts)
RANK_MODE = "bucketed"
_BUCKET = 2048


def _rank_sort(ids: jnp.ndarray, G: int) -> jnp.ndarray:
    """Rank of each point within its network id, via one global argsort."""
    P = ids.shape[0]
    order = jnp.argsort(ids)                      # sorted point indices
    sorted_ids = ids[order]
    start = jnp.searchsorted(sorted_ids, jnp.arange(G))  # [G] first pos of id
    pos = jnp.arange(P) - start[sorted_ids]       # rank within group (sorted)
    return jnp.zeros_like(pos).at[order].set(pos)  # back to original order


def _rank_bucketed(ids: jnp.ndarray, G: int, K: int = _BUCKET) -> jnp.ndarray:
    """Same rank (stable within each chunk; chunks processed in order —
    identical to the stable global rank), computed as:
      rank(i) = (# of j in earlier chunks with id_j == id_i)      [cumsum]
              + (# of j earlier in i's chunk with id_j == id_i)   [local sort]
    """
    P = ids.shape[0]
    pad = (-P) % K
    idsp = jnp.concatenate(
        [ids, jnp.full((pad,), G, ids.dtype)]) if pad else ids
    NB = idsp.shape[0] // K
    chunks = idsp.reshape(NB, K)

    counts = jnp.zeros((NB, G + 1), jnp.int32).at[
        jnp.repeat(jnp.arange(NB), K), idsp].add(1)
    offsets = jnp.cumsum(counts, axis=0) - counts      # exclusive over chunks

    order = jnp.argsort(chunks, axis=-1)               # [NB, K] batched sort
    sorted_ids = jnp.take_along_axis(chunks, order, axis=-1)
    # first position of id g in the sorted chunk = exclusive per-row cumsum
    # of the per-chunk histogram (no searchsorted needed)
    start = jnp.cumsum(counts, axis=1) - counts        # [NB, G+1]
    pos = jnp.arange(K)[None, :] - jnp.take_along_axis(
        start, sorted_ids, axis=-1)                    # rank within chunk
    local = jnp.zeros_like(pos).at[
        jnp.arange(NB)[:, None], order].set(pos)
    rank = local + jnp.take_along_axis(offsets, chunks, axis=-1)
    return rank.reshape(-1)[:P]


def _dispatch(ids: jnp.ndarray, G: int, capacity: int,
              round_offset: int = 0, rank: jnp.ndarray = None):
    """MoE-style capacity dispatch.

    ``round_offset`` selects the capacity window [offset*C, (offset+1)*C)
    of each network's rank order (multi-round serving: round r dispatches
    the points round r-1 overflowed — windows are disjoint by
    construction). Pass a precomputed ``rank`` to amortize the sort
    across rounds.

    Returns (slot [P] in [0, capacity) or -1 when dropped,
             gather_idx [G, C] point index per slot (0 for empty),
             slot_valid [G, C]).
    """
    P = ids.shape[0]
    if rank is None:
        # rank of each point within its network id (stable order)
        if RANK_MODE == "bucketed" and P > _BUCKET:
            rank = _rank_bucketed(ids, G)
        else:
            rank = _rank_sort(ids, G)

    wrank = rank - round_offset * capacity
    slot = jnp.where((wrank >= 0) & (wrank < capacity), wrank, -1)

    # gather index: for (g, c) -> point index. Dropped points scatter to an
    # OUT-OF-BOUNDS index (mode="drop" only ignores out-of-bounds targets —
    # an in-bounds sentinel would clobber a real slot).
    valid_src = slot >= 0
    oob = G * capacity
    flat = jnp.where(valid_src, ids * capacity + slot, oob)
    gather_idx = jnp.zeros((G * capacity,), jnp.int32)
    gather_idx = gather_idx.at[flat].set(
        jnp.arange(P, dtype=jnp.int32), mode="drop"
    )
    slot_valid = jnp.zeros((G * capacity,), bool)
    slot_valid = slot_valid.at[flat].set(True, mode="drop")
    return slot, gather_idx.reshape(G, capacity), slot_valid.reshape(G, capacity)


# Networks packed block-diagonally per matmul (see mlp_grouped). 4 gives
# MXU-aligned shapes for hidden=32/in=63: K=252->256, N=128 — measured the
# fix for the pathological [G,192,63]x[G,63,32] batched einsum (round-3
# kilonerf diag: grouped mlp ~18 ms on-chip for 786k slots vs ~0.03 ms of
# useful MXU time).
PACK = 4


def _pack_x(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """[G, C, i] -> [G/p, C, p*i]: row c holds slot c of p networks."""
    G, C, i = x.shape
    return x.reshape(G // p, p, C, i).transpose(0, 2, 1, 3).reshape(
        G // p, C, p * i)


def _pack_layer(layer: Dict, p: int):
    """Block-diagonal weight packing: [G,i,o] -> [G/p, p*i, p*o].

    The p networks in a pack multiply disjoint column blocks, so the packed
    matmul equals p independent tiny matmuls — at 4x the (padded-anyway)
    FLOPs but MXU-aligned shapes (multimatmul.cu's MAGMA grouping solved
    the same small-matmul problem with vbatched sgemm)."""
    w, b = layer["w"], layer["b"]
    G, i, o = w.shape
    eye = jnp.eye(p, dtype=w.dtype)
    wbd = jnp.einsum("gpio,pq->gpiqo", w.reshape(G // p, p, i, o), eye)
    return wbd.reshape(G // p, p * i, p * o), b.reshape(G // p, 1, p * o)


def mlp_grouped(params: Dict, xg: jnp.ndarray, dg: jnp.ndarray,
                cfg: KiloConfig, pack: int = 0,
                encoded: bool = False) -> jnp.ndarray:
    """Batched tiny-MLP evaluation over grouped slots.

    xg/dg [G, C, 3] local coords and dirs per network slot -> raw [G, C, 4]
    (with ``encoded=True`` they are the pre-computed frequency embeddings
    [G, C, 63]/[G, C, 27] instead — kilonerf_eval encodes BEFORE the slot
    gather so the gather moves 90-wide rows and the sin/cos run on P real
    points, not 2P padded slots).
    Networks are packed ``pack`` at a time into block-diagonal matmuls (the
    analog of MAGMA's vbatched sgemm grouping, multimatmul.cu:244-361) and
    the whole MLP runs in packed layout; only the l3 feat/sigma split and
    the viewdir concat reshape per-network blocks.
    """
    G = xg.shape[0]
    p = pack or PACK
    while p > 1 and G % p:
        p //= 2

    emb_x = xg if encoded else freq_encode(xg, cfg.xyz_freqs)
    emb_d = dg if encoded else freq_encode(dg, cfg.dir_freqs)  # [G, C, 27]
    emb_x = _pack_x(emb_x, p)                            # [G/p, C, p*63]

    def bmm(x, layer):
        wbd, b = _pack_layer(layer, p)
        return (
            jnp.einsum("gck,gko->gco", x, wbd,
                       preferred_element_type=jnp.float32) + b
        )

    h = jax.nn.relu(bmm(emb_x, params["l1"]))
    h = jax.nn.relu(bmm(h, params["l2"]))
    out3 = bmm(h, params["l3"])              # [G/p, C, p*(hidden+1)]
    Gp, C, _ = out3.shape
    out3 = out3.reshape(Gp, C, p, cfg.hidden + 1)
    feat, sigma = out3[..., :-1], out3[..., -1:]         # per-network split
    embd4 = emb_d.reshape(Gp, p, C, -1).transpose(0, 2, 1, 3)
    h = jnp.concatenate([feat, embd4], -1).reshape(Gp, C, -1)
    h = jax.nn.relu(bmm(h, params["l4"]))
    rgb = bmm(h, params["l5"]).reshape(Gp, C, p, 3)      # [G/p, C, p, 3]
    raw = jnp.concatenate([rgb, sigma], -1)              # [G/p, C, p, 4]
    return raw.transpose(0, 2, 1, 3).reshape(G, C, 4)


@partial(jax.jit, static_argnames=("cfg", "capacity"))
def kilonerf_eval(
    params: Dict,
    pts: jnp.ndarray,
    dirs: jnp.ndarray,
    cfg: KiloConfig = KiloConfig(),
    capacity: int = 0,
) -> jnp.ndarray:
    """pts, dirs: [P, 3] -> raw [P, 4] (rgb_raw, sigma_raw).

    Points whose network slot buffer overflows after
    ``cfg.dispatch_rounds`` serving rounds return zeros (treated as empty
    space); size ``capacity`` with cfg.capacity_factor headroom. Rounds
    are disjoint rank windows, so rounds x capacity is the per-network
    serving bound — the knob for ray-clustered loads (docs/PERF.md
    "capacity-overflow drops") without growing the [G, C, 90] buffer.
    """
    P = pts.shape[0]
    G = n_networks(cfg)
    if capacity <= 0:
        capacity = max(8, int(cfg.capacity_factor * P / G))
    rounds = max(1, int(cfg.dispatch_rounds))

    ids = assign_networks(pts, cfg)
    local = global_to_local(pts, ids, cfg)
    if RANK_MODE == "bucketed" and P > _BUCKET:
        rank = _rank_bucketed(ids, G)
    else:
        rank = _rank_sort(ids, G)

    # Encode BEFORE the slot gather (round-3 diag): a [P,3] row gather
    # uses 3 of 128 lanes and measured 24 ms for 786k slots; gathering the
    # concatenated 90-wide embeddings moves the same points at ~30x the
    # lane utilization, and the sin/cos run on P points instead of the
    # 2x-padded slot buffer.
    nx = freq_out_dim(3, cfg.xyz_freqs)
    emb = jnp.concatenate([
        freq_encode(local, cfg.xyz_freqs),
        freq_encode(dirs, cfg.dir_freqs),
    ], axis=-1)                                     # [P, 63+27]

    # dropped points (slot == -1 in every round) stay zero: empty space
    out = jnp.zeros((P, 4), emb.dtype)
    for r in range(rounds):
        slot, gather_idx, slot_valid = _dispatch(ids, G, capacity,
                                                 round_offset=r, rank=rank)
        embg = emb[gather_idx.reshape(-1)].reshape(G, capacity,
                                                   emb.shape[-1])
        raw_slots = mlp_grouped(params, embg[..., :nx], embg[..., nx:],
                                cfg, encoded=True)  # [G, C, 4]

        # back to point order via the INVERSE gather
        # out[i] = raw[ids_i, slot_i] (round-3 diag: the scatter
        # formulation — reference scatter_int32_float4 — measured 36 ms
        # for 393k 4-wide rows on the v5e; TPU random-row scatters are
        # scalar-bound, the gather is cheaper and each point's slot is
        # unique by construction)
        inv = ids * capacity + jnp.clip(slot, 0, capacity - 1)
        out_r = raw_slots.reshape(-1, 4)[inv]
        out = jnp.where((slot >= 0)[:, None], out_r, out)
    return out


def query_network_kilonerf(params, pts, viewdirs, opts, cfg: KiloConfig = None):
    """Renderer query-path adapter: pts [N,S,3], viewdirs [N,3] -> [N,S,4]."""
    if cfg is None:
        cfg = KiloConfig()
    n, s, _ = pts.shape
    dirs = jnp.broadcast_to(viewdirs[:, None, :], (n, s, 3)).reshape(-1, 3)
    raw = kilonerf_eval(params, pts.reshape(-1, 3), dirs, cfg)
    return raw.reshape(n, s, 4)


@partial(jax.jit,
         static_argnames=("teacher_query_fn", "tx_update", "cfg", "n_pts",
                          "voxel_size", "occ_frac"),
         donate_argnames=("params", "opt_state"))
def distill_step(
    params: Dict,
    opt_state,
    key,
    teacher_query_fn,
    tx_update,
    cfg: KiloConfig,
    n_pts: int = 65536,
    occ_centers: jnp.ndarray = None,
    voxel_size: float = 0.0,
    occ_frac: float = 0.5,
):
    """One KiloNeRF distillation step: match the teacher's activated outputs
    (sigmoid rgb, relu sigma) at random (point, direction) samples — the
    reference/KiloNeRF training recipe for the many-small-MLPs model.

    Sampling is occupancy-weighted when ``occ_centers`` ([M, 3] centers of
    the teacher's occupied voxels) is given: ``occ_frac`` of the batch is
    drawn inside occupied voxels (center + uniform jitter of ``voxel_size``)
    and the rest uniformly over the box. Pure uniform sampling wastes ~90%
    of the student's fitting budget on empty space (round-1 student:
    12.95 dB) — the KiloNeRF recipe concentrates samples near geometry."""
    import optax

    k1, k2 = jax.random.split(key)
    capacity = 0  # kilonerf_eval default: 2x the all-networks mean load
    if occ_centers is not None and occ_centers.shape[0] > 0:
        k1a, k1b, k1c = jax.random.split(k1, 3)
        n_occ = int(n_pts * occ_frac)
        vid = jax.random.randint(k1a, (n_occ,), 0, occ_centers.shape[0])
        jitter = jax.random.uniform(
            k1b, (n_occ, 3), jnp.float32, -0.5, 0.5) * voxel_size
        pts_occ = occ_centers[vid] + jitter
        pts_uni = jax.random.uniform(k1c, (n_pts - n_occ, 3), jnp.float32,
                                     cfg.bbox_min, cfg.bbox_max)
        pts = jnp.concatenate([pts_occ, pts_uni], axis=0)
        pts = jnp.clip(pts, cfg.bbox_min, cfg.bbox_max)
        # capacity sized to the OCCUPIED-half's per-voxel load, not the
        # all-networks mean: n_occ points land in the M occupied voxels
        # (mean n_occ/M), which dwarfs kilonerf_eval's default
        # 2*n_pts/G when M << G — with the default the dispatch silently
        # dropped ~half the geometry samples (returned raw=0), flooring
        # the distill loss at ~0.8 and the student at ~9-13 dB (round-5
        # EVAL; the round-1 "12.95 dB stall" shares this root cause).
        # 6x mean covers the multinomial tail; drops become negligible.
        m_occ = int(occ_centers.shape[0])
        capacity = int(min(n_pts, max(64, (6 * n_occ) // max(1, m_occ))))
    else:
        pts = jax.random.uniform(k1, (n_pts, 3), jnp.float32,
                                 cfg.bbox_min, cfg.bbox_max)
    dirs = jax.random.normal(k2, (n_pts, 3), jnp.float32)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    t_raw = teacher_query_fn(pts[:, None, :], dirs)[:, 0, :]
    t_rgb = jax.nn.sigmoid(t_raw[..., :3])
    # density matched in log1p space: raw densities span orders of
    # magnitude and a plain L2 is dominated by the few largest values
    t_sigma = jnp.log1p(jax.nn.relu(t_raw[..., 3]))

    def loss_fn(p):
        raw = kilonerf_eval(p, pts, dirs, cfg, capacity=capacity)
        rgb = jax.nn.sigmoid(raw[..., :3])
        sigma = jnp.log1p(jax.nn.relu(raw[..., 3]))
        return jnp.mean((rgb - t_rgb) ** 2) + jnp.mean((sigma - t_sigma) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx_update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss
