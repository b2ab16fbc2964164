#!/usr/bin/env python
"""Backward-pass cost of the hash lookup: scatter-add shapes, corner vs
cellpack, plus dtype variants. Explains the hashgrid_layout_bench result.

Inputs VARY per iteration (the relay caches identical calls).
Run standalone on the TPU (no other TPU process!).
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend())
    key = jax.random.PRNGKey(0)
    iters = 3

    # hashgrid-shaped: P points, L levels
    P, L, F = 196_608, 16, 2
    cases = [
        ("corner  bf16", (L * (1 << 19), F), L * P * 8, jnp.bfloat16),
        ("cellpack bf16", (L * (1 << 16), 8 * F), L * P, jnp.bfloat16),
        ("cellpack f32 ", (L * (1 << 16), 8 * F), L * P, jnp.float32),
        ("cellpack w128", (L * (1 << 13), 128), L * P // 8, jnp.bfloat16),
    ]
    for name, tshape, R, dtype in cases:
        table = jax.random.normal(key, tshape, dtype)
        idxs = [jax.random.randint(jax.random.fold_in(key, i), (R,), 0,
                                   tshape[0], jnp.int32)
                for i in range(iters + 1)]
        cts = [jax.random.normal(jax.random.fold_in(key, 100 + i),
                                 (R, tshape[1]), dtype)
               for i in range(iters + 1)]

        fwd = jax.jit(lambda tab, ix: tab[ix].sum(dtype=jnp.float32))
        bwd = jax.jit(
            lambda tab, ix, c: jax.vjp(lambda t: t[ix], tab)[1](c)[0]
            .sum(dtype=jnp.float32))

        np.asarray(fwd(table, idxs[-1]))  # compile
        t0 = time.time()
        for i in range(iters):
            out = fwd(table, idxs[i])
        np.asarray(out)
        dt_f = (time.time() - t0) / iters

        np.asarray(bwd(table, idxs[-1], cts[-1]))  # compile
        t0 = time.time()
        for i in range(iters):
            out = bwd(table, idxs[i], cts[i])
        np.asarray(out)
        dt_b = (time.time() - t0) / iters
        print(f"{name}: fwd {dt_f*1e3:8.1f} ms ({R/dt_f/1e6:8.1f} Mrows/s)"
              f"   bwd {dt_b*1e3:8.1f} ms ({R/dt_b/1e6:8.1f} Mrows/s)")

    # the fix candidate: wide-row gather fwd + narrow-split scatter bwd
    from nerf_tpu.models.hashgrid import _gather_rows_narrow_bwd

    tshape, R, dtype = (L * (1 << 16), 8 * F), L * P, jnp.bfloat16
    table = jax.random.normal(key, tshape, dtype)
    idxs = [jax.random.randint(jax.random.fold_in(key, 50 + i), (R,), 0,
                               tshape[0], jnp.int32)
            for i in range(iters + 1)]
    cts = [jax.random.normal(jax.random.fold_in(key, 150 + i),
                             (R, tshape[1]), dtype)
           for i in range(iters + 1)]
    bwd2 = jax.jit(
        lambda tab, ix, c: jax.vjp(
            lambda t: _gather_rows_narrow_bwd(t, ix, 8), tab)[1](c)[0]
        .sum(dtype=jnp.float32))
    np.asarray(bwd2(table, idxs[-1], cts[-1]))
    t0 = time.time()
    for i in range(iters):
        out = bwd2(table, idxs[i], cts[i])
    np.asarray(out)
    dt = (time.time() - t0) / iters
    print(f"cellpack narrow-split bwd: {dt*1e3:8.1f} ms "
          f"({R/dt/1e6:8.1f} Mrows/s)")


if __name__ == "__main__":
    main()
