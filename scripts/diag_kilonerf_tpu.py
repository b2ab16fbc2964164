#!/usr/bin/env python
"""KiloNeRF on-chip stage breakdown (VERDICT round-1 weak #5: the routed
tiny-MLP path measures 3x SLOWER than the big MLP it should beat).

FLOP accounting says the tiny MLPs are ~100x cheaper per point than the big
MLP (12 kFLOP vs 1.19 MFLOP), so even heavily MXU-padded matmuls can't
explain a slowdown — the suspect is the dispatch (argsort + scatters) or
the padded [G, C, ...] encode/gather buffers. This times each stage alone:

    dispatch   argsort-based capacity routing (_dispatch)
    gather     point -> slot buffer gathers
    encode     freq_encode on the [G, C, 3] slot buffer
    mlp        the grouped einsum stack (mlp_grouped)
    scatter    slot -> point write-back
    full       kilonerf_eval end-to-end
    bigmlp     the 8x256 fused-path MLP on the same point count (yardstick)

Run on TPU (no other TPU process!): python -u scripts/diag_kilonerf_tpu.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, iters=5):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # sync
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.time() - t0) / iters


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    from nerf_tpu.ops import kilonerf as kn

    cfg = kn.KiloConfig()
    G = kn.n_networks(cfg)
    P = 2048 * 192  # one render tile's fine pass
    capacity = max(8, int(cfg.capacity_factor * P / G))
    print(f"P={P} G={G} capacity={capacity}")

    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (P, 3), jnp.float32, -2.0, 2.0)
    dirs = jax.random.normal(jax.random.fold_in(key, 1), (P, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    params = kn.init_kilonerf(jax.random.PRNGKey(1), cfg)

    ids = kn.assign_networks(pts, cfg)
    local = kn.global_to_local(pts, ids, cfg)

    dispatch = jax.jit(lambda i: kn._dispatch(i, G, capacity))
    t = timeit(dispatch, ids)
    print(f"dispatch: {t*1e3:8.1f} ms  ({P/t/1e6:6.1f} Mpts/s)")
    slot, gather_idx, slot_valid = dispatch(ids)

    gather = jax.jit(lambda l, d, gi: (
        l[gi.reshape(-1)].reshape(G, capacity, 3),
        d[gi.reshape(-1)].reshape(G, capacity, 3)))
    t = timeit(gather, local, dirs, gather_idx)
    print(f"gather:   {t*1e3:8.1f} ms")
    xg, dg = gather(local, dirs, gather_idx)

    from nerf_tpu.models.encoders import freq_encode

    enc = jax.jit(lambda x, d: (freq_encode(x, cfg.xyz_freqs),
                                freq_encode(d, cfg.dir_freqs)))
    t = timeit(enc, xg, dg)
    print(f"encode:   {t*1e3:8.1f} ms  (on {G*capacity} padded slots)")

    mlp = jax.jit(lambda p, x, d: kn.mlp_grouped(p, x, d, cfg))
    t = timeit(mlp, params, xg, dg)
    gfl = G * capacity * 12160 / 1e9
    print(f"mlp:      {t*1e3:8.1f} ms  ({gfl/t:6.0f} GFLOP/s useful)")
    raw_slots = mlp(params, xg, dg)

    def scat(rs, gi, sv, sl):
        out = jnp.zeros((P, 4), rs.dtype)
        flat_idx = jnp.where(sv.reshape(-1), gi.reshape(-1), P)
        out = out.at[flat_idx].set(rs.reshape(-1, 4), mode="drop")
        return jnp.where((sl >= 0)[:, None], out, 0.0)

    t = timeit(jax.jit(scat), raw_slots, gather_idx, slot_valid, slot)
    print(f"scatter:  {t*1e3:8.1f} ms")

    full = jax.jit(lambda p, x, d: kn.kilonerf_eval(p, x, d, cfg))
    t_full = timeit(full, params, pts, dirs)
    print(f"full:     {t_full*1e3:8.1f} ms  ({P/t_full/1e6:6.1f} Mpts/s)")

    # yardstick: the big-MLP XLA path on the same points
    from nerf_tpu.render.renderer import RenderOptions, query_network_xla
    from nerf_tpu.train.loop import init_nerf_params

    opts = RenderOptions(use_pallas=False)
    bparams = init_nerf_params(jax.random.PRNGKey(2), opts)
    big = jax.jit(lambda p, x, d: query_network_xla(
        p, x.reshape(2048, 192, 3), d, opts))
    t_big = timeit(big, bparams["fine"], pts, dirs[:2048])
    print(f"bigmlp:   {t_big*1e3:8.1f} ms  ({P/t_big/1e6:6.1f} Mpts/s)  "
          f"kilonerf speedup x{t_big/t_full:.2f}")
