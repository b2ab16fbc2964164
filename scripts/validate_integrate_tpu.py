#!/usr/bin/env python
"""TPU-lowering validation + timing of the Pallas integration kernel.

Runs ops/integrate.py::integrate_pallas against render/composite.py on the
default backend at bench-like shapes, asserting allclose (ERT on and off)
and reporting per-call timings. Closes the PARITY gap "TPU-lowering
validation of ops/integrate.py" (interpret-mode was already covered by
tests/test_integrate_kernel.py on CPU).

Usage:  python scripts/validate_integrate_tpu.py [N] [S]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

# runnable as `python scripts/validate_integrate_tpu.py` from the repo root
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from nerf_tpu.ops.integrate import integrate_pallas
    from nerf_tpu.render.composite import composite

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 192
    interp = jax.default_backend() in ("cpu", "gpu", "cuda")
    print(f"backend={jax.default_backend()}  N={N} S={S}"
          + ("  (interpret mode)" if interp else ""))

    rng = np.random.RandomState(0)
    sigma = jnp.asarray(rng.randn(N, S).astype(np.float32) * 2)
    rgb_raw = jnp.asarray(rng.randn(N, S, 3).astype(np.float32))
    z = jnp.asarray(np.sort(rng.uniform(2.0, 6.0, (N, S))).astype(np.float32))
    rays_d = rng.randn(N, 3).astype(np.float32)
    rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_d = jnp.asarray(rays_d * rng.uniform(0.9, 1.1, (N, 1)))

    raw = jnp.concatenate([rgb_raw, sigma[..., None]], -1)

    from functools import partial

    @partial(jax.jit, static_argnames=("ert",))
    def xla_fn(raw, z, rays_d, ert):
        return composite(raw, z, rays_d, white_bkgd=True,
                         ert_threshold=ert if ert > 0 else None)

    for ert in (0.0, 0.01):
        out_p = integrate_pallas(sigma, rgb_raw, z, rays_d,
                                 ert_threshold=ert, white_bkgd=True,
                                 interpret=interp)
        out_x = xla_fn(raw, z, rays_d, ert)
        for k in ("rgb_map", "acc_map", "depth_map"):
            a = np.asarray(out_p[k])
            b = np.asarray(out_x[k])
            err = float(np.max(np.abs(a - b)))
            print(f"ert={ert}: {k:10s} max|diff| = {err:.3e}")
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(out_p["weights"]),
                                   np.asarray(out_x["weights"]),
                                   rtol=2e-4, atol=2e-4)

        # timing (vary inputs so the relay cache can't serve repeats)
        for name, fn in (
            ("pallas", lambda s, r, zz: integrate_pallas(
                s, r, zz, rays_d, ert_threshold=ert, interpret=interp)),
            ("xla", lambda s, r, zz: xla_fn(
                jnp.concatenate([r, s[..., None]], -1), zz, rays_d, ert)),
        ):
            np.asarray(fn(sigma, rgb_raw, z)["rgb_map"])  # warm
            t0 = time.time()
            iters = 5
            for i in range(iters):
                out = fn(sigma + i * 1e-6, rgb_raw, z)
                np.asarray(out["rgb_map"])
            dt = (time.time() - t0) / iters * 1e3
            print(f"ert={ert}: {name:6s} {dt:8.2f} ms/call "
                  f"({N * S / dt * 1e3 / 1e6:,.0f} Msamples/s)")
    print("OK: pallas integrate matches composite on this backend")


if __name__ == "__main__":
    main()
