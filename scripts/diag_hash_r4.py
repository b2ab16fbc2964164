#!/usr/bin/env python
"""Round-4 hash-encoder diagnosis: resolve the cellpack e2e contradiction.

PERF.md "open contradiction": cellpack microbenches 4.9x (gather) / 5.7x
(scatter) faster than corner, yet the END-TO-END train step measured 6.6x
SLOWER. Suspects named in PERF.md: the scatter fused with the f32->bf16
cotangent cast; gather/hash remat in scan. This script, one process:

1. times the real scanned train step over a variant matrix
   {corner, cellpack} x {bf16, f32 tables} x {scan, single-step}
2. captures a jax.profiler trace of the two scanned bf16 variants
   (summarize offline with scripts/trace_summary.py — no jax import needed)
3. dumps compiled HLO of the single-step variants and greps scatter/gather
   lines with shapes, so the un-fused op is visible by name.

Run standalone on the TPU (no other TPU process!):
    python scripts/diag_hash_r4.py [--iters N]
"""
import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from nerf_tpu.config import load_cfg
    from nerf_tpu.render.renderer import RenderOptions
    from nerf_tpu.train.loop import init_nerf_params
    from nerf_tpu.train.optim import make_optimizer
    from nerf_tpu.train.state import init_state, train_step, train_steps

    iters = 3
    for i, a in enumerate(sys.argv):
        if a == "--iters" and i + 1 < len(sys.argv):
            iters = int(sys.argv[i + 1])

    print("backend:", jax.default_backend(), flush=True)
    n_rays, chunk = 1024, 8
    H = W = 128
    rng = np.random.RandomState(0)
    images_u8 = jnp.asarray(rng.randint(0, 256, (4, H, W, 3), np.uint8))
    poses = jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * 4))
    K = jnp.asarray([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]],
                    jnp.float32)

    cfg = load_cfg("configs/nerf/lego_hashgrid.yaml")
    cfg.task_arg.N_rays = n_rays
    tx = make_optimizer(cfg)
    base = RenderOptions.from_cfg(cfg)

    variants = []
    for layout in ("corner", "cellpack"):
        for dt in ("bfloat16", "float32"):
            variants.append((f"{layout}_{dt[:4]}_scan",
                             dict(hash_layout=layout, hash_dtype=dt), True))
    variants += [("corner_bf16_single", dict(hash_layout="corner"), False),
                 ("cellpack_bf16_single", dict(hash_layout="cellpack"), False)]

    results = {}
    for name, kw, scanned in variants:
        opts = dataclasses.replace(base, **kw)
        params = init_nerf_params(jax.random.PRNGKey(0), opts)
        state = init_state(params, tx)
        key = jax.random.PRNGKey(1)
        t0 = time.time()
        if scanned:
            state, stats = train_steps(state, images_u8, poses, K, key, tx,
                                       opts, n_rays, chunk)
        else:
            state, stats = train_step(state, images_u8, poses, K, key, tx,
                                      opts, n_rays)
        np.asarray(stats["loss"])
        t_compile = time.time() - t0
        t0 = time.time()
        steps_done = 0
        for i in range(iters):
            k = jax.random.fold_in(key, i)
            if scanned:
                state, stats = train_steps(state, images_u8, poses, K, k, tx,
                                           opts, n_rays, chunk)
                steps_done += chunk
            else:
                state, stats = train_step(state, images_u8, poses, K, k, tx,
                                          opts, n_rays)
                steps_done += 1
        np.asarray(stats["loss"])
        dt = (time.time() - t0) / steps_done
        results[name] = dt
        print(f"{name:22s}: {dt*1e3:8.1f} ms/step  {n_rays/dt:9,.0f} rays/s"
              f"  (compile {t_compile:.1f}s)  loss {float(stats['loss']):.4f}",
              flush=True)

    # Pallas DMA-pipelined gather vs XLA native gather on the hash-shaped
    # workload (kernel-level evidence for the PERF.md hash story)
    if "--no-pallas-gather" not in sys.argv:
        from nerf_tpu.ops.hash_gather import BLOCK_ROWS, gather_rows_pallas

        P, L = 196_608, 16
        for label, n_rows, w, t_rows in (
                ("cellpack-shape", L * P, 16, 16 * (1 << 16)),
                ("corner-shape", L * P * 8, 2, 16 * (1 << 19)),
        ):
            n_rows = (n_rows // BLOCK_ROWS) * BLOCK_ROWS
            table = jax.random.normal(jax.random.PRNGKey(3), (t_rows, w),
                                      jnp.bfloat16)
            idxs = [jax.random.randint(jax.random.PRNGKey(10 + i), (n_rows,),
                                       0, t_rows, jnp.int32) for i in range(4)]
            xla_g = jax.jit(lambda t, ix: t[ix].sum(dtype=jnp.float32))
            pal_g = jax.jit(lambda t, ix: gather_rows_pallas(t, ix)
                            .sum(dtype=jnp.float32))
            for gname, fn in (("xla", xla_g), ("pallas", pal_g)):
                try:
                    np.asarray(fn(table, idxs[0]))  # compile
                    t0 = time.time()
                    outs = [fn(table, idxs[1 + i]) for i in range(3)]
                    np.asarray(outs[-1])
                    dt = (time.time() - t0) / 3
                    print(f"gather {label:14s} {gname:6s}: {dt*1e3:8.1f} ms  "
                          f"{n_rows/dt/1e6:8.1f} Mrows/s", flush=True)
                except Exception as e:
                    print(f"gather {label:14s} {gname:6s}: FAILED "
                          f"{type(e).__name__}: {str(e)[:200]}", flush=True)

    # profiler traces of the two scanned bf16 variants
    for layout in ("corner", "cellpack"):
        opts = dataclasses.replace(base, hash_layout=layout)
        params = init_nerf_params(jax.random.PRNGKey(0), opts)
        state = init_state(params, tx)
        with jax.profiler.trace(f"/tmp/jaxprof/hash_{layout}"):
            state, stats = train_steps(state, images_u8, poses, K,
                                       jax.random.PRNGKey(2), tx, opts,
                                       n_rays, chunk)
            np.asarray(stats["loss"])
        print(f"trace -> /tmp/jaxprof/hash_{layout}", flush=True)

    # HLO dump of the single-step variants: find the scatter/gather lowering
    for layout in ("corner", "cellpack"):
        opts = dataclasses.replace(base, hash_layout=layout)
        params = init_nerf_params(jax.random.PRNGKey(0), opts)
        state = init_state(params, tx)
        # train_step is already jitted — lower it directly
        lowered = train_step.lower(state, images_u8, poses, K,
                                   jax.random.PRNGKey(1), tx=tx, opts=opts,
                                   n_rays=n_rays)
        txt = lowered.compile().as_text()
        path = f"/tmp/hash_hlo_{layout}.txt"
        with open(path, "w") as f:
            f.write(txt)
        lines = [ln.strip() for ln in txt.splitlines()
                 if ("scatter" in ln or "gather" in ln) and "=" in ln]
        print(f"--- {layout}: {len(lines)} scatter/gather HLO lines "
              f"(full dump {path})")
        for ln in lines[:20]:
            print("   ", ln[:160], flush=True)


if __name__ == "__main__":
    main()
