#!/usr/bin/env python
"""Characterize the TPU gather cost model for hash-table lookups.

Question (docs/PERF.md "Pallas hash-gather kernel" lever): is an XLA row
gather ROWS-bound (cost per gathered row, independent of row width) or
ELEMENTS-bound (cost per scalar)?  The answer picks the hashgrid redesign:

- rows-bound  -> pack all 8 trilinear corners of a cell into ONE table row
                 ("cellpack", 8x fewer rows, same elements) is an 8x win.
- elements-bound -> cellpack is a wash; only fewer fetched elements or a
                 non-gather mechanism (DMA pipeline) can win.

Run standalone on the TPU (no other TPU process!):
    python scripts/gather_microbench.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def bench(fn, table, idx_list, iters=3):
    """Times fn(table, idx) over DISTINCT idx arrays per iteration.

    The relay caches byte-identical calls (CLAUDE.md 'vary PRNG keys
    between iterations'), so idx_list must hold iters+1 pre-generated
    distinct index arrays; idx_list[0] warms up compile.
    """
    assert len(idx_list) >= iters + 1
    np.asarray(fn(table, idx_list[0]))  # compile + sync
    t0 = time.time()
    outs = [fn(table, idx_list[1 + i]) for i in range(iters)]
    np.asarray(outs[-1])
    return (time.time() - t0) / iters


def make_idx_list(key, shape, maxval, iters=3):
    import jax
    return [jax.random.randint(jax.random.fold_in(key, i), shape, 0, maxval,
                               dtype="int32") for i in range(iters + 1)]


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend())
    key = jax.random.PRNGKey(0)
    T = 1 << 19  # table rows per level, hashgrid default

    # total elements held constant at 64M bf16 across the sweep
    total_elems = 1 << 24
    for W in (1, 2, 4, 8, 16, 32, 128):
        R = total_elems // W
        table = jax.random.normal(key, (T, W), jnp.bfloat16)
        idxs = make_idx_list(jax.random.fold_in(key, W), (R,), T)

        @jax.jit
        def g(tab, ix):
            return tab[ix].sum(dtype=jnp.float32)

        dt = bench(g, table, idxs)
        print(
            f"W={W:4d} R={R/1e6:7.2f}M rows: {dt*1e3:8.1f} ms  "
            f"{R/dt/1e6:8.1f} Mrows/s  {R*W/dt/1e6:9.1f} Melem/s"
        )

    # f32 vs bf16 at fixed row count
    R = 1 << 21
    # ADVICE r4: hash(name) is PYTHONHASHSEED-salted (non-reproducible
    # across processes) — use a fixed per-case integer instead
    for case_i, (dtype, name) in enumerate(
            ((jnp.bfloat16, "bf16"), (jnp.float32, "f32 "))):
        table = jax.random.normal(key, (T, 2), dtype)
        idxs = make_idx_list(jax.random.fold_in(key, 100 + case_i), (R,), T)

        @jax.jit
        def g(tab, ix):
            return tab[ix].sum(dtype=jnp.float32)

        dt = bench(g, table, idxs)
        print(f"dtype={name} W=2 R={R/1e6:.2f}M: {dt*1e3:8.1f} ms  "
              f"{R/dt/1e6:8.1f} Mrows/s")

    # the hashgrid-shaped workloads: P points, L=16 levels
    P, L, F = 196_608, 16, 2
    table = jax.random.normal(key, (L * T, F), jnp.bfloat16)
    idxs = make_idx_list(jax.random.fold_in(key, 1001), (L * P * 8,),
                          L * T)

    @jax.jit
    def cur(tab, ix):
        return tab[ix].sum(dtype=jnp.float32)

    dt = bench(cur, table, idxs)
    print(f"current hash shape  ({L*P*8/1e6:.1f}M rows of {F}): "
          f"{dt*1e3:8.1f} ms  {P/dt/1e3:7.1f} Kpts/s")

    tableC = jax.random.normal(key, (L * (T // 8), 8 * F), jnp.bfloat16)
    idxsC = make_idx_list(jax.random.fold_in(key, 1002), (L * P,),
                          L * (T // 8))

    @jax.jit
    def cellpack(tab, ix):
        return tab[ix].sum(dtype=jnp.float32)

    dt = bench(cellpack, tableC, idxsC)
    print(f"cellpack hash shape ({L*P/1e6:.1f}M rows of {8*F}): "
          f"{dt*1e3:8.1f} ms  {P/dt/1e3:7.1f} Kpts/s")


if __name__ == "__main__":
    main()
