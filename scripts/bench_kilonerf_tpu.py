#!/usr/bin/env python
"""Stage-level timing of the KiloNeRF routed evaluation on the real chip.

Times, at render-realistic shapes (8192 rays x 192 samples = 1.57M points):
  dispatch  (argsort + rank + gather-index build)
  gather    (points/dirs into [G, C, .] slots)
  mlp       (the batched-einsum grouped tiny MLPs)
  scatter   (slot results back to point order)
  full      (kilonerf_eval end to end)
against the big-MLP fused/XLA query on the same points — to locate the 3x
slowdown the round-1 verdict flagged (VERDICT Weak #5).
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, n=5):
    fn()  # compile
    t0 = time.time()
    for _ in range(n):
        out = fn()
    np.asarray(jax_leaves(out))
    return (time.time() - t0) / n


def jax_leaves(out):
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    return np.asarray(leaves[0]).ravel()[:1]


def main():
    import jax
    import jax.numpy as jnp

    from nerf_tpu.ops import kilonerf as K

    print("backend:", jax.default_backend())
    cfg = K.KiloConfig()
    G = K.n_networks(cfg)
    P = 8192 * 192
    capacity = max(8, int(cfg.capacity_factor * P / G))
    print(f"P={P} G={G} capacity={capacity} slots={G*capacity}")

    key = jax.random.PRNGKey(0)
    params = K.init_kilonerf(key, cfg)
    pts = jax.random.uniform(key, (P, 3), jnp.float32, -1.1, 1.1)
    dirs = jax.random.normal(jax.random.PRNGKey(1), (P, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    ids = K.assign_networks(pts, cfg)
    local = K.global_to_local(pts, ids, cfg)

    dispatch = jax.jit(lambda i: K._dispatch(i, G, capacity))
    t_dispatch = timeit(lambda: dispatch(ids))
    print(f"dispatch: {t_dispatch*1e3:8.1f} ms")

    t_sort = timeit(jax.jit(lambda: jnp.argsort(ids)))
    print(f"  argsort alone: {t_sort*1e3:8.1f} ms")

    slot, gather_idx, slot_valid = dispatch(ids)

    def gather():
        xg = local[gather_idx.reshape(-1)].reshape(G, capacity, 3)
        dg = dirs[gather_idx.reshape(-1)].reshape(G, capacity, 3)
        return xg, dg

    t_gather = timeit(jax.jit(gather))
    print(f"gather:   {t_gather*1e3:8.1f} ms")
    xg, dg = jax.jit(gather)()

    t_mlp = timeit(jax.jit(lambda: K.mlp_grouped(params, xg, dg, cfg)))
    print(f"mlp:      {t_mlp*1e3:8.1f} ms")
    raw_slots = jax.jit(lambda: K.mlp_grouped(params, xg, dg, cfg))()

    def scatter():
        out = jnp.zeros((P, 4), raw_slots.dtype)
        flat_idx = jnp.where(slot_valid.reshape(-1), gather_idx.reshape(-1), P)
        return out.at[flat_idx].set(raw_slots.reshape(-1, 4), mode="drop")

    t_scatter = timeit(jax.jit(scatter))
    print(f"scatter:  {t_scatter*1e3:8.1f} ms")

    t_full = timeit(jax.jit(
        lambda: K.kilonerf_eval(params, pts, dirs, cfg)))
    print(f"FULL kilonerf_eval: {t_full*1e3:8.1f} ms "
          f"({P/t_full/1e6:.1f} Mpts/s)")

    # big-MLP comparison on the same points
    from nerf_tpu.ops.fused_mlp import query_network_pallas
    from nerf_tpu.render.renderer import RenderOptions, query_network_xla

    opts = RenderOptions()
    from nerf_tpu.train.loop import init_nerf_params

    nerf_params = init_nerf_params(jax.random.PRNGKey(3), opts)["fine"]
    pts3 = pts.reshape(8192, 192, 3)
    vdirs = dirs.reshape(8192, 192, 3)[:, 0, :]
    t_big = timeit(jax.jit(
        lambda: query_network_xla(nerf_params, pts3, vdirs, opts)))
    print(f"big-MLP XLA query (same points): {t_big*1e3:8.1f} ms "
          f"({P/t_big/1e6:.1f} Mpts/s)")
    t_bigp = timeit(jax.jit(
        lambda: query_network_pallas(nerf_params, pts3, vdirs, opts)))
    print(f"big-MLP fused query (same points): {t_bigp*1e3:8.1f} ms "
          f"({P/t_bigp/1e6:.1f} Mpts/s)")


if __name__ == "__main__":
    main()
