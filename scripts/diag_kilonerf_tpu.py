#!/usr/bin/env python
"""KiloNeRF on-chip stage breakdown (VERDICT round-1 weak #5: the routed
tiny-MLP path measures 3x SLOWER than the big MLP it should beat).

FLOP accounting says the tiny MLPs are ~100x cheaper per point than the big
MLP (12 kFLOP vs 1.19 MFLOP), so even heavily MXU-padded matmuls can't
explain a slowdown. This times each stage alone:

    dispatch   argsort-based capacity routing (_dispatch)
    gather     point -> slot buffer gathers
    encode     freq_encode on the [G, C, 3] slot buffer
    mlp        the grouped einsum stack (mlp_grouped, block-diag packed)
    scatter    slot -> point write-back
    full       kilonerf_eval end-to-end
    bigmlp     the 8x256 fused-path MLP on the same point count (yardstick)

Measurement hygiene for the relay-attached chip (round-3 fix): every timed
fn reduces its output to ONE scalar inside jit (the first diag transferred
up to 198 MB/iter to host, timing the tunnel not the chip), and inputs vary
per iteration (the relay caches identical calls).

Run on TPU (no other TPU process!): python -u scripts/diag_kilonerf_tpu.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, make_args, iters=5):
    np.asarray(fn(*make_args(0)))  # compile + warmup
    args = [make_args(i + 1) for i in range(iters)]  # pre-build, vary inputs
    t0 = time.time()
    outs = [fn(*a) for a in args]
    for o in outs:
        np.asarray(o)
    return (time.time() - t0) / iters


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    from nerf_tpu.ops import kilonerf as kn

    cfg = kn.KiloConfig()
    G = kn.n_networks(cfg)
    P = 2048 * 192  # one render tile's fine pass
    capacity = max(8, int(cfg.capacity_factor * P / G))
    print(f"P={P} G={G} capacity={capacity} pack={kn.PACK}")

    key = jax.random.PRNGKey(0)

    def mkpts(i):
        k = jax.random.fold_in(key, i)
        pts = jax.random.uniform(k, (P, 3), jnp.float32, -2.0, 2.0)
        dirs = jax.random.normal(jax.random.fold_in(k, 1), (P, 3))
        return pts, dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    params = kn.init_kilonerf(jax.random.PRNGKey(1), cfg)
    pts0, dirs0 = mkpts(0)
    ids0 = kn.assign_networks(pts0, cfg)
    local0 = kn.global_to_local(pts0, ids0, cfg)

    dispatch = jax.jit(lambda i: sum(
        jnp.sum(x) for x in kn._dispatch(i, G, capacity)[1:]))
    t = timeit(dispatch, lambda i: (kn.assign_networks(mkpts(i)[0], cfg),))
    print(f"dispatch: {t*1e3:8.1f} ms  ({P/t/1e6:6.1f} Mpts/s)")

    _, gather_idx, slot_valid = jax.jit(
        lambda i: kn._dispatch(i, G, capacity))(ids0)
    slot0 = jax.jit(lambda i: kn._dispatch(i, G, capacity)[0])(ids0)

    def do_gather(l, d, gi):
        xg = l[gi.reshape(-1)].reshape(G, capacity, 3)
        dg = d[gi.reshape(-1)].reshape(G, capacity, 3)
        return jnp.sum(xg) + jnp.sum(dg)

    t = timeit(jax.jit(do_gather),
               lambda i: (local0 + i * 1e-6, dirs0, gather_idx))
    print(f"gather:   {t*1e3:8.1f} ms")

    xg = local0[gather_idx.reshape(-1)].reshape(G, capacity, 3)
    dg = dirs0[gather_idx.reshape(-1)].reshape(G, capacity, 3)

    from nerf_tpu.models.encoders import freq_encode

    enc = jax.jit(lambda x, d: jnp.sum(freq_encode(x, cfg.xyz_freqs))
                  + jnp.sum(freq_encode(d, cfg.dir_freqs)))
    t = timeit(enc, lambda i: (xg + i * 1e-6, dg))
    print(f"encode:   {t*1e3:8.1f} ms  (on {G*capacity} padded slots)")

    mlp = jax.jit(lambda p, x, d: jnp.sum(kn.mlp_grouped(p, x, d, cfg)))
    t = timeit(mlp, lambda i: (params, xg + i * 1e-6, dg))
    gfl = G * capacity * 12160 / 1e9
    print(f"mlp:      {t*1e3:8.1f} ms  ({gfl/t:6.0f} GFLOP/s useful)")
    raw_slots = jax.jit(
        lambda p, x, d: kn.mlp_grouped(p, x, d, cfg))(params, xg, dg)

    def scat(rs, gi, sv, sl):
        out = jnp.zeros((P, 4), rs.dtype)
        flat_idx = jnp.where(sv.reshape(-1), gi.reshape(-1), P)
        out = out.at[flat_idx].set(rs.reshape(-1, 4), mode="drop")
        return jnp.sum(jnp.where((sl >= 0)[:, None], out, 0.0))

    t = timeit(jax.jit(scat),
               lambda i: (raw_slots + i * 1e-6, gather_idx, slot_valid, slot0))
    print(f"scatter:  {t*1e3:8.1f} ms")

    full = jax.jit(
        lambda p, x, d: jnp.sum(kn.kilonerf_eval(p, x, d, cfg)))
    t_full = timeit(full, lambda i: (params, *mkpts(i)))
    print(f"full:     {t_full*1e3:8.1f} ms  ({P/t_full/1e6:6.1f} Mpts/s)")

    # yardstick: the big-MLP XLA path on the same points
    from nerf_tpu.render.renderer import RenderOptions, query_network_xla
    from nerf_tpu.train.loop import init_nerf_params

    opts = RenderOptions(use_pallas=False)
    bparams = init_nerf_params(jax.random.PRNGKey(2), opts)
    big = jax.jit(lambda p, x, d: jnp.sum(query_network_xla(
        p, x.reshape(2048, 192, 3), d, opts)))
    t_big = timeit(big, lambda i: (bparams["fine"], *(lambda a: (a[0], a[1][:2048]))(mkpts(i))))
    print(f"bigmlp:   {t_big*1e3:8.1f} ms  ({P/t_big/1e6:6.1f} Mpts/s)  "
          f"kilonerf speedup x{t_big/t_full:.2f}")
