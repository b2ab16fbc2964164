#!/usr/bin/env python
"""Per-leaf on-chip gradient diagnosis for the fused MLP kernel pair.

Compares three gradient paths on the SAME loss/inputs:
  A: pure XLA query (reference math)
  B: fused Pallas forward + hand-written Pallas backward (BACKWARD="pallas")
  C: fused Pallas forward + recompute-XLA backward (BACKWARD="xla")

If B!=C the hand-written backward kernel is wrong on real hardware;
if B==C but both differ from A, the difference is forward-kernel rounding
(MXU pass structure), not a backward bug.
"""
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from nerf_tpu.ops import fused_mlp
    from nerf_tpu.render.renderer import RenderOptions
    from nerf_tpu.train.loop import init_nerf_params
    from nerf_tpu.train.state import nerf_loss

    print("backend:", jax.default_backend())
    n = 256
    rays_o = jnp.zeros((n, 3), jnp.float32)
    theta = jnp.linspace(0, 1, n)
    rays_d = jnp.stack([0.3 * theta, 0.2 - 0.4 * theta,
                        -jnp.ones_like(theta)], axis=-1)
    target = jax.random.uniform(jax.random.PRNGKey(1), (n, 3))
    base = dict(n_samples=64, n_importance=128, compute_dtype="float32",
                enable_ess=False, enable_ert=True, perturb=0.0)
    params = init_nerf_params(jax.random.PRNGKey(2),
                              RenderOptions(use_pallas=False, **base))

    def grads_for(opts):
        g = jax.jit(jax.grad(
            lambda p: nerf_loss(p, rays_o, rays_d, target,
                                jax.random.PRNGKey(3), opts, None)[0]))(params)
        jax.block_until_ready(g)
        return jax.tree_util.tree_map(np.asarray, g)

    g_a = grads_for(RenderOptions(use_pallas=False, **base))
    fused_mlp.BACKWARD = "pallas"
    g_b = grads_for(RenderOptions(use_pallas=True, **base))
    fused_mlp.BACKWARD = "xla"
    g_c = grads_for(RenderOptions(use_pallas=True, **base))

    leaves_a, tree = jax.tree_util.tree_flatten(g_a)
    leaves_b = jax.tree_util.tree_flatten(g_b)[0]
    leaves_c = jax.tree_util.tree_flatten(g_c)[0]
    paths = jax.tree_util.tree_flatten_with_path(g_a)[0]

    def stats(x, y):
        x = x.astype(np.float64).ravel()
        y = y.astype(np.float64).ravel()
        nx, ny = np.linalg.norm(x), np.linalg.norm(y)
        cos = float(x @ y / max(nx * ny, 1e-30)) if nx * ny > 0 else 1.0
        rel = float(np.linalg.norm(x - y) / max(ny, 1e-30))
        return cos, rel, nx, ny

    print(f"{'leaf':55s} {'cosBA':>8s} {'relBA':>9s} {'cosCA':>8s} "
          f"{'relCA':>9s} {'cosBC':>8s} {'relBC':>9s} {'|A|':>9s}")
    for (path, la), lb, lc in zip(paths, leaves_b, leaves_c):
        name = jax.tree_util.keystr(path)[:55]
        cba, rba, _, na = stats(lb, la)
        cca, rca, _, _ = stats(lc, la)
        cbc, rbc, _, _ = stats(lb, lc)
        print(f"{name:55s} {cba:8.5f} {rba:9.2e} {cca:8.5f} {rca:9.2e} "
              f"{cbc:8.5f} {rbc:9.2e} {na:9.2e}")

    def global_stats(gx, gy):
        x = np.concatenate([l.ravel() for l in gx]).astype(np.float64)
        y = np.concatenate([l.ravel() for l in gy]).astype(np.float64)
        return stats(x, y)

    for nm, gx in (("B(pallas-bwd)", leaves_b), ("C(xla-recompute)", leaves_c)):
        cos, rel, _, _ = global_stats(gx, leaves_a)
        print(f"GLOBAL {nm} vs A: cos={cos:.6f} rel={rel:.3e}")
    cos, rel, _, _ = global_stats(leaves_b, leaves_c)
    print(f"GLOBAL B vs C: cos={cos:.6f} rel={rel:.3e}")


if __name__ == "__main__":
    main()
