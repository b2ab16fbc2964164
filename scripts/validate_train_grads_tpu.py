#!/usr/bin/env python
"""On-chip validation: the fused Pallas kernel pair (fwd + hand-written
backward) and the Pallas integrate kernel produce training gradients that
match the XLA path — run on the real TPU (interpret-mode parity lives in
tests/test_fused_bwd.py / test_integrate_kernel.py; this is the hardware
counterpart the round-1 verdict asked for)."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def leaf_stats(ga, gb):
    import jax

    worst_cos, worst_rel = 1.0, 0.0
    for la, lb in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
        a = np.asarray(la, np.float64).ravel()
        b = np.asarray(lb, np.float64).ravel()
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na == 0 and nb == 0:
            continue
        cos = float(a @ b / max(na * nb, 1e-30))
        rel = float(np.linalg.norm(a - b) / max(nb, 1e-30))
        worst_cos = min(worst_cos, cos)
        worst_rel = max(worst_rel, rel)
    return worst_cos, worst_rel


def main():
    import jax
    import jax.numpy as jnp

    from nerf_tpu.render.renderer import RenderOptions
    from nerf_tpu.train.loop import init_nerf_params
    from nerf_tpu.train.state import nerf_loss

    print("backend:", jax.default_backend(), jax.devices())

    n = 256
    key = jax.random.PRNGKey(0)
    rays_o = jnp.zeros((n, 3), jnp.float32)
    theta = jnp.linspace(0, 1, n)
    rays_d = jnp.stack([0.3 * theta, 0.2 - 0.4 * theta,
                        -jnp.ones_like(theta)], axis=-1)
    target = jax.random.uniform(jax.random.PRNGKey(1), (n, 3))

    def grads_for(opts):
        params = init_nerf_params(jax.random.PRNGKey(2), opts)
        g = jax.jit(jax.grad(
            lambda p: nerf_loss(p, rays_o, rays_d, target,
                                jax.random.PRNGKey(3), opts, None)[0]))(params)
        jax.block_until_ready(g)
        return jax.tree_util.tree_map(np.asarray, g)

    # 1) fused Pallas query (custom VJP w/ hand-written Pallas backward)
    #    vs XLA query — f32 weights so only the kernel itself differs
    base = dict(n_samples=64, n_importance=128, compute_dtype="float32",
                enable_ess=False, enable_ert=True, perturb=0.0)
    t0 = time.time()
    g_xla = grads_for(RenderOptions(use_pallas=False, **base))
    g_pal = grads_for(RenderOptions(use_pallas=True, **base))
    cos, rel = leaf_stats(g_pal, g_xla)
    print(f"fused-vs-xla train grads: worst cos={cos:.6f} worst rel={rel:.3e}"
          f"  ({time.time()-t0:.0f}s)")
    assert cos > 0.999 and rel < 2e-2, "fused kernel grad parity FAILED"

    # 2) Pallas integrate kernel in the loss (custom VJP recompute backward)
    t0 = time.time()
    g_int = grads_for(RenderOptions(use_pallas=False,
                                    use_pallas_integrate=True, **base))
    cos, rel = leaf_stats(g_int, g_xla)
    print(f"pallas-integrate train grads: worst cos={cos:.6f} "
          f"worst rel={rel:.3e}  ({time.time()-t0:.0f}s)")
    assert cos > 0.999 and rel < 2e-2, "integrate kernel grad parity FAILED"

    print("OK: on-chip training-gradient parity for both kernels")


if __name__ == "__main__":
    main()
