#!/usr/bin/env python
"""Round-5 scatter-add strategy shootout for the hash-table gradient.

The cellpack train step is scatter-add bound (260 of 311 ms,
docs/PERF.md): 3.1M 16-wide cotangent rows scatter into the [L*T/8, 16]
table at 12.1 Mrows/s. This times candidate restructurings of EXACTLY
that update on the hash-shaped workload, so a winner can become the
encode's custom VJP before the round-5 main training run:

  plain        — .at[idx].add(ct)                      (the current path)
  sorted       — sort rows by index, indices_are_sorted=True
  slotpack     — pack 8 consecutive table rows into 128-wide super-rows;
                 scatter 128-wide updates at row/8 (wide rows amortize
                 per-row cost: 29.3 Mrows/s at W=128 vs 12.1 at W=16)

(A sort+segment-sum dedup variant was considered and rejected without
measurement: static shapes force the deduped scatter to still carry N
rows — zero-filled duplicates — so it cannot beat `sorted`, which it
strictly contains.)

All variants are numerically checked against plain on the first rep.
Run standalone on the TPU:  python scripts/scatter_strategies_r5.py
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), flush=True)

    # hash-shaped workload: P points x L levels, cellpack table
    P, L, W = 196_608, 16, 16
    Tc = 1 << 16  # rows per level (2^19 / 8)
    n_rows_total = L * Tc
    N = L * P  # 3.1M update rows

    key = jax.random.PRNGKey(0)
    # realistic index distribution: coarse levels heavily duplicated,
    # fine levels ~unique (mimic res^3 cells per level)
    rng = np.random.RandomState(0)
    idx_np = np.empty((L, P), np.int32)
    res = 16.0
    for lv in range(L):
        n_cells = min(int(res) ** 3, Tc)
        idx_np[lv] = rng.randint(0, n_cells, P).astype(np.int32) + lv * Tc
        res *= 1.3819
    flat_idx = jnp.asarray(idx_np.reshape(-1))
    cts = [jax.random.normal(jax.random.fold_in(key, i), (N, W),
                             jnp.float32).astype(jnp.bfloat16)
           for i in range(4)]

    def plain(ct, idx):
        return jnp.zeros((n_rows_total, W), ct.dtype).at[idx].add(ct)

    def sorted_scatter(ct, idx):
        order = jnp.argsort(idx)
        return jnp.zeros((n_rows_total, W), ct.dtype).at[idx[order]].add(
            ct[order], indices_are_sorted=True)

    def slotpack(ct, idx):
        super_idx = idx >> 3
        slot = idx & 7
        wide = (ct[:, None, :]
                * jax.nn.one_hot(slot, 8, dtype=ct.dtype)[..., None]
                ).reshape(N, 8 * W)
        out = jnp.zeros((n_rows_total >> 3, 8 * W), ct.dtype
                        ).at[super_idx].add(wide)
        return out.reshape(n_rows_total, W)

    fns = {"plain": plain, "sorted": sorted_scatter, "slotpack": slotpack}
    results = {}
    ref = None
    for name, fn in fns.items():
        jf = jax.jit(fn)
        try:
            t0 = time.time()
            out = jf(cts[0], flat_idx)
            out_np = np.asarray(out, np.float32)
            t_compile = time.time() - t0
            if name == "plain":
                ref = out_np
            else:
                # bf16 accumulation order differs; tolerate rounding
                err = float(np.max(np.abs(out_np - ref)))
                scale = float(np.max(np.abs(ref))) + 1e-6
                assert err / scale < 0.1, f"{name} mismatch rel {err/scale}"
            t0 = time.time()
            for i in range(3):
                out = jf(cts[1 + i], flat_idx)
            np.asarray(out)
            dt = (time.time() - t0) / 3
            results[name] = {"ms": round(dt * 1e3, 1),
                             "Mrows_per_s": round(N / dt / 1e6, 1),
                             "compile_s": round(t_compile, 1)}
            print(f"{name:9s}: {dt*1e3:8.1f} ms  {N/dt/1e6:7.1f} Mrows/s  "
                  f"(compile {t_compile:.1f}s)", flush=True)
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
            print(f"{name:9s}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    with open("/tmp/scatter_strategies_r5.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
