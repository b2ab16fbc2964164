"""Fused frequency-encoding + NeRF-MLP evaluation as one Pallas TPU kernel.

TPU-native analog of the reference's fused CUDA network evaluation
(``cuda/network_eval.cu:25-254`` — smem-cached params, inline fourier embed,
fully unrolled MLP per thread block) re-designed for the MXU:

- One grid step processes a TILE of sample points with ALL layers resident
  in VMEM — only the raw points/dirs (24 B/point) and the rgb+sigma output
  (16 B/point) touch HBM, vs ~2 KB/point of intermediate activations on the
  unfused XLA path. The MLP itself runs as bf16 MXU matmuls with f32
  accumulation.
- The reference's interleaved positional-encoding layout
  [x, sin(2^0 x), cos(2^0 x), ...] (freq.py via encoding/__init__.py:7-18)
  is absorbed into a row permutation of the consuming weight matrices, so
  the in-kernel encoding is just ``a = x @ S; sin(a); cos(a)`` followed by
  dense matmuls — no lane-level concatenation.

Weight layout (prepared by ``repack_params`` from the standard pytree):
    layer0:  h = relu(x@W0x + sin(a)@W0s + cos(a)@W0c + b0)
    layers 1..4: h = relu(h@Wi + bi)
    skip (layer 5, reference skips=[4]):
             h = relu(x@W5x + sin(a)@W5s + cos(a)@W5c + h@W5h + b5)
    layers 6,7: h = relu(h@Wi + bi)
    sigma = h@Wa + ba ;  feat = h@Wf + bf
    v = relu(feat@Wvf + d@Wvx + sin(b)@Wvs + cos(b)@Wvc + bv),  b = d @ Sd
    rgb = v@Wr + br ;  out = [rgb, sigma]
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.encoders import freq_bands

# number of weight tensors fed to the kernel, in order
_KPARAM_KEYS = (
    "w0x", "w0s", "w0c", "b0",
    "w1", "b1", "w2", "b2", "w3", "b3", "w4", "b4",
    "w5x", "w5s", "w5c", "w5h", "b5",
    "w6", "b6", "w7", "b7",
    "wa", "ba", "wf", "bf",
    "wvx", "wvs", "wvc", "wvf", "bv",
    "wr", "br",
    "sx", "sd",
)


def _emb_perm(input_dim: int, num_freqs: int) -> np.ndarray:
    """Permutation new->old embedding rows.

    Old (reference) layout: [x(d), sin(f0 x)(d), cos(f0 x)(d), sin(f1 x)...].
    New layout: [x(d), sin-block (f-major, d-minor) (d*F), cos-block (d*F)].
    """
    d, F = input_dim, num_freqs
    idx = list(range(d))  # identity part
    for f in range(F):  # sin block
        idx.extend(d + f * 2 * d + j for j in range(d))
    for f in range(F):  # cos block
        idx.extend(d + f * 2 * d + d + j for j in range(d))
    return np.asarray(idx, np.int32)


def _scale_matrix(input_dim: int, num_freqs: int) -> np.ndarray:
    """S [d, d*F] with S[j, f*d + j] = band[f]: x @ S gives the f-major,
    d-minor phase matrix whose sin/cos are the encoding blocks."""
    bands = freq_bands(num_freqs)
    S = np.zeros((input_dim, input_dim * num_freqs), np.float32)
    for f in range(num_freqs):
        for j in range(input_dim):
            S[j, f * input_dim + j] = bands[f]
    return S


def repack_params(
    params: Dict[str, Any],
    xyz_freqs: int = 10,
    dir_freqs: int = 4,
    weight_dtype=jnp.bfloat16,
) -> Dict[str, jnp.ndarray]:
    """Standard NeRF-MLP pytree (models/nerf_mlp.py layout, weights [in,out])
    -> kernel weight dict. Pure jnp (jit-friendly; gathers are tiny)."""
    d = 3
    perm_x = _emb_perm(d, xyz_freqs)
    perm_d = _emb_perm(d, dir_freqs)
    nx = d * xyz_freqs  # 30
    nd = d * dir_freqs  # 12
    pl_ = params["pts_linears"]

    def wd(x):
        return jnp.asarray(x, weight_dtype)

    def bias(x):
        return jnp.asarray(x, jnp.float32).reshape(1, -1)

    w0 = pl_[0]["w"][perm_x]  # [63, 256] rows permuted to new layout
    w5 = pl_[5]["w"]  # [63+256, 256]: rows [0:63]=emb, [63:]=h
    w5e = w5[: 3 + 2 * nx][perm_x]
    wv = params["views_linears"][0]["w"]  # [256+27, 128]: [0:256]=feat
    wve = wv[256:][perm_d]

    out = {
        "w0x": wd(w0[:d]), "w0s": wd(w0[d : d + nx]), "w0c": wd(w0[d + nx :]),
        "b0": bias(pl_[0]["b"]),
        "w1": wd(pl_[1]["w"]), "b1": bias(pl_[1]["b"]),
        "w2": wd(pl_[2]["w"]), "b2": bias(pl_[2]["b"]),
        "w3": wd(pl_[3]["w"]), "b3": bias(pl_[3]["b"]),
        "w4": wd(pl_[4]["w"]), "b4": bias(pl_[4]["b"]),
        "w5x": wd(w5e[:d]), "w5s": wd(w5e[d : d + nx]), "w5c": wd(w5e[d + nx :]),
        "w5h": wd(w5[3 + 2 * nx :]), "b5": bias(pl_[5]["b"]),
        "w6": wd(pl_[6]["w"]), "b6": bias(pl_[6]["b"]),
        "w7": wd(pl_[7]["w"]), "b7": bias(pl_[7]["b"]),
        "wa": wd(params["alpha_linear"]["w"]), "ba": bias(params["alpha_linear"]["b"]),
        "wf": wd(params["feature_linear"]["w"]), "bf": bias(params["feature_linear"]["b"]),
        "wvx": wd(wve[:d]), "wvs": wd(wve[d : d + nd]), "wvc": wd(wve[d + nd :]),
        "wvf": wd(wv[:256]), "bv": bias(params["views_linears"][0]["b"]),
        "wr": wd(params["rgb_linear"]["w"]), "br": bias(params["rgb_linear"]["b"]),
        "sx": jnp.asarray(_scale_matrix(3, xyz_freqs)),
        "sd": jnp.asarray(_scale_matrix(3, dir_freqs)),
    }
    return out


def _fused_kernel(pts_ref, dirs_ref, *refs):
    (w0x, w0s, w0c, b0,
     w1, b1, w2, b2, w3, b3, w4, b4,
     w5x, w5s, w5c, w5h, b5,
     w6, b6, w7, b7,
     wa, ba, wf, bf,
     wvx, wvs, wvc, wvf, bv,
     wr, br, sx, sd, out_ref) = refs

    f32 = jnp.float32

    def dot(a, w_ref):
        # compute dtype follows the packed weight dtype (bf16 fast path /
        # f32 parity path), accumulation always f32
        return jnp.dot(a.astype(w_ref.dtype), w_ref[:],
                       preferred_element_type=f32)

    x = pts_ref[:]  # [T, 3] f32
    a = jnp.dot(x, sx[:], preferred_element_type=f32)  # [T, 30] phases
    sa, ca = jnp.sin(a), jnp.cos(a)

    h = jnp.maximum(dot(x, w0x) + dot(sa, w0s) + dot(ca, w0c) + b0[:], 0.0)
    h = jnp.maximum(dot(h, w1) + b1[:], 0.0)
    h = jnp.maximum(dot(h, w2) + b2[:], 0.0)
    h = jnp.maximum(dot(h, w3) + b3[:], 0.0)
    h = jnp.maximum(dot(h, w4) + b4[:], 0.0)
    # skip layer: absorbed concat([emb, h]) @ W5
    h = jnp.maximum(
        dot(x, w5x) + dot(sa, w5s) + dot(ca, w5c) + dot(h, w5h) + b5[:], 0.0
    )
    h = jnp.maximum(dot(h, w6) + b6[:], 0.0)
    h = jnp.maximum(dot(h, w7) + b7[:], 0.0)

    sigma = dot(h, wa) + ba[:]  # [T, 1]
    feat = dot(h, wf) + bf[:]  # [T, 256]

    d = dirs_ref[:]  # [T, 3]
    b = jnp.dot(d, sd[:], preferred_element_type=f32)  # [T, 12]
    sb, cb = jnp.sin(b), jnp.cos(b)
    v = jnp.maximum(
        dot(feat, wvf) + dot(d, wvx) + dot(sb, wvs) + dot(cb, wvc) + bv[:], 0.0
    )
    rgb = dot(v, wr) + br[:]  # [T, 3]

    out_ref[:] = jnp.concatenate([rgb, sigma], axis=-1)


@partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_nerf_eval(
    kparams: Dict[str, jnp.ndarray],
    pts: jnp.ndarray,
    dirs: jnp.ndarray,
    tile: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """pts, dirs: [P, 3] float32 -> raw [P, 4] (rgb_raw, sigma_raw) float32."""
    P = pts.shape[0]
    n_pad = (-P) % tile
    if n_pad:
        pts = jnp.pad(pts, ((0, n_pad), (0, 0)))
        dirs = jnp.pad(dirs, ((0, n_pad), (0, 0)))
    n_tiles = (P + n_pad) // tile

    weight_inputs = [kparams[k] for k in _KPARAM_KEYS]
    const_spec = [
        pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for w in weight_inputs
    ]

    out = pl.pallas_call(
        _fused_kernel,
        out_shape=jax.ShapeDtypeStruct((P + n_pad, 4), jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *const_spec,
        ],
        out_specs=pl.BlockSpec((tile, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        # point tiles are independent: let Mosaic pipeline the grid
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(pts, dirs, *weight_inputs)
    return out[:P]


def _xla_reference(params, pts, dirs, opts):
    """The same math on the XLA path (used as the recompute backward)."""
    from ..models.encoders import freq_encode
    from ..models.nerf_mlp import apply_nerf_mlp

    emb = jnp.concatenate(
        [freq_encode(pts, opts.xyz_freqs), freq_encode(dirs, opts.dir_freqs)],
        axis=-1,
    )
    return apply_nerf_mlp(
        params, emb, input_ch=opts.input_ch, skips=opts.skips,
        use_viewdirs=opts.use_viewdirs,
        compute_dtype=jnp.dtype(opts.compute_dtype),
    )


# test hook: force interpret-mode pallas (CPU) inside the diff wrapper
INTERPRET = False

# Points per kernel grid step, tunable via bench.py --ktile. Measured on
# the v5e (trained lego, 800x800): 1024 -> 41.9k rays/s, 2048 -> 44.6k
# (13 MB scoped VMEM), 4096 -> OOM (26.8 MB > the 16 MB scoped limit).
TILE = 2048


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_nerf_eval_diff(params, pts, dirs, opts):
    """Differentiable fused evaluation: Pallas kernel forward, recompute
    XLA backward (identical math; custom Pallas backward is a future
    optimization). params is the standard MLP pytree."""
    kparams = repack_params(params, opts.xyz_freqs, opts.dir_freqs,
                            weight_dtype=jnp.dtype(opts.compute_dtype))
    return fused_nerf_eval(kparams, pts, dirs, tile=TILE, interpret=INTERPRET)


def _diff_fwd(params, pts, dirs, opts):
    return fused_nerf_eval_diff(params, pts, dirs, opts), (params, pts, dirs)


# backward implementation switch: "pallas" (hand-written fused backward,
# ops/fused_mlp_bwd.py) or "xla" (recompute via jax.vjp of the same math)
BACKWARD = "pallas"


def _diff_bwd(opts, res, g):
    params, pts, dirs = res
    if BACKWARD == "pallas":
        from .fused_mlp_bwd import fused_nerf_bwd, kgrads_to_param_grads

        kparams = repack_params(params, opts.xyz_freqs, opts.dir_freqs,
                                weight_dtype=jnp.dtype(opts.compute_dtype))
        kgrads, dpts, ddirs = fused_nerf_bwd(
            kparams, pts, dirs, g.astype(jnp.float32), interpret=INTERPRET)
        dparams = kgrads_to_param_grads(kgrads, params, opts.xyz_freqs,
                                        opts.dir_freqs)
        return dparams, dpts, ddirs
    _, vjp = jax.vjp(lambda p, x, d: _xla_reference(p, x, d, opts),
                     params, pts, dirs)
    return vjp(g)


fused_nerf_eval_diff.defvjp(_diff_fwd, _diff_bwd)


def supports(opts) -> bool:
    """The fused kernel covers the reference architecture (8x256, skip after
    layer 4, viewdir head). Anything else falls back to the XLA path."""
    return (
        opts.mlp_depth == 8
        and opts.mlp_width == 256
        and tuple(opts.skips) == (4,)
        and opts.use_viewdirs
        and getattr(opts, "xyz_encoder_type", "frequency") == "frequency"
    )


def query_network_pallas(params, pts, viewdirs, opts):
    """Drop-in replacement for renderer.query_network_xla using the fused
    kernel. pts: [N, S, 3]; viewdirs: [N, 3] -> raw [N, S, 4]."""
    if not supports(opts) or viewdirs is None:
        from ..render.renderer import query_network_xla

        return query_network_xla(params, pts, viewdirs, opts)
    n, s, _ = pts.shape
    dirs = jnp.broadcast_to(viewdirs[:, None, :], (n, s, 3))
    raw = fused_nerf_eval_diff(
        params,
        pts.reshape(-1, 3).astype(jnp.float32),
        dirs.reshape(-1, 3).astype(jnp.float32),
        opts,
    )
    return raw.reshape(n, s, 4)
