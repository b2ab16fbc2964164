"""Hand-written Pallas backward for the fused NeRF-MLP kernel.

One grid step recomputes the forward activations for a tile of points and
runs the full backward chain in VMEM — the "recompute-in-backward" strategy
of SURVEY.md §7.3 (activations for a 256-wide MLP per sample are too big to
stash in HBM). Weight/bias gradients accumulate across grid steps into
constant-index output blocks (f32); dpts/ddirs stream out per tile.

All "transposed" matmuls use dot_general contracting dims instead of
materialized transposes:
    A^T @ B   = dot_general(A, B, contract A dim0 with B dim0)
    G @ W^T   = dot_general(G, W, contract G dim1 with W dim1)
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_mlp import _KPARAM_KEYS

# gradient outputs, in emission order (all weight keys except sx/sd)
_GRAD_KEYS = tuple(k for k in _KPARAM_KEYS if k not in ("sx", "sd"))


def _dgT(a, b):
    """a[T,m]^T @ b[T,n] -> [m,n], f32 accumulate."""
    return lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _dgWT(g, w):
    """g[T,n] @ w[m,n]^T -> [T,m], f32 accumulate."""
    return lax.dot_general(g, w, (((1,), (1,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _bwd_kernel(pts_ref, dirs_ref, g_ref, *refs):
    n_w = len(_KPARAM_KEYS)
    w = dict(zip(_KPARAM_KEYS, refs[:n_w]))
    outs = dict(zip(_GRAD_KEYS, refs[n_w:n_w + len(_GRAD_KEYS)]))
    dpts_ref, ddirs_ref = refs[n_w + len(_GRAD_KEYS):]

    f32 = jnp.float32

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for k in _GRAD_KEYS:
            outs[k][...] = jnp.zeros_like(outs[k])

    def dot(a, w_ref):
        return jnp.dot(a.astype(w_ref.dtype), w_ref[:],
                       preferred_element_type=f32)

    # ---- forward recompute (mirrors fused_mlp._fused_kernel) ----
    x = pts_ref[:]                                    # [T, 3]
    a = jnp.dot(x, w["sx"][:], preferred_element_type=f32)
    sa, ca = jnp.sin(a), jnp.cos(a)
    h1 = jnp.maximum(dot(x, w["w0x"]) + dot(sa, w["w0s"]) + dot(ca, w["w0c"])
                     + w["b0"][:], 0.0)
    h2 = jnp.maximum(dot(h1, w["w1"]) + w["b1"][:], 0.0)
    h3 = jnp.maximum(dot(h2, w["w2"]) + w["b2"][:], 0.0)
    h4 = jnp.maximum(dot(h3, w["w3"]) + w["b3"][:], 0.0)
    h5 = jnp.maximum(dot(h4, w["w4"]) + w["b4"][:], 0.0)
    h6 = jnp.maximum(dot(x, w["w5x"]) + dot(sa, w["w5s"]) + dot(ca, w["w5c"])
                     + dot(h5, w["w5h"]) + w["b5"][:], 0.0)
    h7 = jnp.maximum(dot(h6, w["w6"]) + w["b6"][:], 0.0)
    h8 = jnp.maximum(dot(h7, w["w7"]) + w["b7"][:], 0.0)
    feat = dot(h8, w["wf"]) + w["bf"][:]
    d = dirs_ref[:]
    b = jnp.dot(d, w["sd"][:], preferred_element_type=f32)
    sb, cb = jnp.sin(b), jnp.cos(b)
    v = jnp.maximum(dot(feat, w["wvf"]) + dot(d, w["wvx"]) + dot(sb, w["wvs"])
                    + dot(cb, w["wvc"]) + w["bv"][:], 0.0)

    # ---- backward ----
    g = g_ref[:]                                       # [T, 4]
    drgb, dsig = g[:, :3], g[:, 3:4]

    def wmat(k):
        return w[k][:].astype(f32)

    dv = _dgWT(drgb, wmat("wr")) * (v > 0)
    outs["wr"][...] += _dgT(v, drgb)
    outs["br"][...] += jnp.sum(drgb, axis=0, keepdims=True)

    dfeat = _dgWT(dv, wmat("wvf"))
    dd_direct = _dgWT(dv, wmat("wvx"))
    dsb = _dgWT(dv, wmat("wvs"))
    dcb = _dgWT(dv, wmat("wvc"))
    outs["wvf"][...] += _dgT(feat, dv)
    outs["wvx"][...] += _dgT(d, dv)
    outs["wvs"][...] += _dgT(sb, dv)
    outs["wvc"][...] += _dgT(cb, dv)
    outs["bv"][...] += jnp.sum(dv, axis=0, keepdims=True)

    db_phase = cb * dsb - sb * dcb
    ddirs_ref[:] = dd_direct + lax.dot_general(
        db_phase, w["sd"][:], (((1,), (1,)), ((), ())),
        preferred_element_type=f32)

    dh8 = _dgWT(dfeat, wmat("wf")) + _dgWT(dsig, wmat("wa"))
    outs["wf"][...] += _dgT(h8, dfeat)
    outs["bf"][...] += jnp.sum(dfeat, axis=0, keepdims=True)
    outs["wa"][...] += _dgT(h8, dsig)
    outs["ba"][...] += jnp.sum(dsig, axis=0, keepdims=True)

    def dense_bwd(dh_post, h_out, h_in, wk, bk):
        """relu dense layer backward: returns dh_in."""
        dh_pre = dh_post * (h_out > 0)
        outs[wk][...] += _dgT(h_in, dh_pre)
        outs[bk][...] += jnp.sum(dh_pre, axis=0, keepdims=True)
        return _dgWT(dh_pre, wmat(wk))

    dh7 = dense_bwd(dh8, h8, h7, "w7", "b7")
    dh6 = dense_bwd(dh7, h7, h6, "w6", "b6")

    dh6_pre = dh6 * (h6 > 0)
    outs["w5x"][...] += _dgT(x, dh6_pre)
    outs["w5s"][...] += _dgT(sa, dh6_pre)
    outs["w5c"][...] += _dgT(ca, dh6_pre)
    outs["w5h"][...] += _dgT(h5, dh6_pre)
    outs["b5"][...] += jnp.sum(dh6_pre, axis=0, keepdims=True)
    dsa5 = _dgWT(dh6_pre, wmat("w5s"))
    dca5 = _dgWT(dh6_pre, wmat("w5c"))
    dx5 = _dgWT(dh6_pre, wmat("w5x"))
    dh5 = _dgWT(dh6_pre, wmat("w5h"))

    dh4 = dense_bwd(dh5, h5, h4, "w4", "b4")
    dh3 = dense_bwd(dh4, h4, h3, "w3", "b3")
    dh2 = dense_bwd(dh3, h3, h2, "w2", "b2")
    dh1 = dense_bwd(dh2, h2, h1, "w1", "b1")

    dh1_pre = dh1 * (h1 > 0)
    outs["w0x"][...] += _dgT(x, dh1_pre)
    outs["w0s"][...] += _dgT(sa, dh1_pre)
    outs["w0c"][...] += _dgT(ca, dh1_pre)
    outs["b0"][...] += jnp.sum(dh1_pre, axis=0, keepdims=True)
    dsa0 = _dgWT(dh1_pre, wmat("w0s"))
    dca0 = _dgWT(dh1_pre, wmat("w0c"))
    dx0 = _dgWT(dh1_pre, wmat("w0x"))

    da = ca * (dsa0 + dsa5) - sa * (dca0 + dca5)
    dpts_ref[:] = dx0 + dx5 + lax.dot_general(
        da, w["sx"][:], (((1,), (1,)), ((), ())), preferred_element_type=f32)


@partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_nerf_bwd(
    kparams: Dict[str, jnp.ndarray],
    pts: jnp.ndarray,
    dirs: jnp.ndarray,
    g: jnp.ndarray,
    tile: int = 512,
    interpret: bool = False,
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray, jnp.ndarray]:
    """Returns ({kparam_key: grad}, dpts [P,3], ddirs [P,3])."""
    P = pts.shape[0]
    n_pad = (-P) % tile
    if n_pad:
        pts = jnp.pad(pts, ((0, n_pad), (0, 0)))
        dirs = jnp.pad(dirs, ((0, n_pad), (0, 0)))
        g = jnp.pad(g, ((0, n_pad), (0, 0)))  # zero grads for padding
    n_tiles = (P + n_pad) // tile

    weight_inputs = [kparams[k] for k in _KPARAM_KEYS]
    const_in = [
        pl.BlockSpec(wv.shape, lambda i, nd=wv.ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for wv in weight_inputs
    ]
    grad_shapes = [
        jax.ShapeDtypeStruct(kparams[k].shape, jnp.float32) for k in _GRAD_KEYS
    ]
    const_out = [
        pl.BlockSpec(kparams[k].shape,
                     lambda i, nd=kparams[k].ndim: (0,) * nd,
                     memory_space=pltpu.VMEM)
        for k in _GRAD_KEYS
    ]

    out = pl.pallas_call(
        _bwd_kernel,
        out_shape=(
            *grad_shapes,
            jax.ShapeDtypeStruct((P + n_pad, 3), jnp.float32),
            jax.ShapeDtypeStruct((P + n_pad, 3), jnp.float32),
        ),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *const_in,
        ],
        out_specs=(
            *const_out,
            pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(pts, dirs, g, *weight_inputs)

    grads = dict(zip(_GRAD_KEYS, out[: len(_GRAD_KEYS)]))
    dpts = out[-2][:P]
    ddirs = out[-1][:P]
    return grads, dpts, ddirs


def kgrads_to_param_grads(kgrads: Dict[str, jnp.ndarray], params,
                          xyz_freqs: int = 10, dir_freqs: int = 4):
    """Map kernel-layout gradients back to the standard MLP pytree layout
    (inverse of repack_params' row permutation/splitting)."""
    import numpy as np

    from .fused_mlp import _emb_perm

    d = 3
    perm_x = _emb_perm(d, xyz_freqs)
    perm_d = _emb_perm(d, dir_freqs)
    inv_x = np.argsort(perm_x)
    inv_d = np.argsort(perm_d)

    def unperm_x(stacked):
        return stacked[inv_x]

    zeros_like = lambda p: jax.tree_util.tree_map(jnp.zeros_like, p)
    g = zeros_like(params)

    def asdt(x, ref):
        return jnp.asarray(x, jnp.asarray(ref).dtype)

    # layer 0
    w0_new = jnp.concatenate(
        [kgrads["w0x"], kgrads["w0s"], kgrads["w0c"]], axis=0)
    g["pts_linears"][0]["w"] = asdt(unperm_x(w0_new), params["pts_linears"][0]["w"])
    g["pts_linears"][0]["b"] = asdt(kgrads["b0"][0], params["pts_linears"][0]["b"])
    for i, (wk, bk) in enumerate(
        [("w1", "b1"), ("w2", "b2"), ("w3", "b3"), ("w4", "b4")], start=1
    ):
        g["pts_linears"][i]["w"] = asdt(kgrads[wk], params["pts_linears"][i]["w"])
        g["pts_linears"][i]["b"] = asdt(kgrads[bk][0], params["pts_linears"][i]["b"])
    w5_emb = jnp.concatenate(
        [kgrads["w5x"], kgrads["w5s"], kgrads["w5c"]], axis=0)
    w5 = jnp.concatenate([unperm_x(w5_emb), kgrads["w5h"]], axis=0)
    g["pts_linears"][5]["w"] = asdt(w5, params["pts_linears"][5]["w"])
    g["pts_linears"][5]["b"] = asdt(kgrads["b5"][0], params["pts_linears"][5]["b"])
    for i, (wk, bk) in enumerate([("w6", "b6"), ("w7", "b7")], start=6):
        g["pts_linears"][i]["w"] = asdt(kgrads[wk], params["pts_linears"][i]["w"])
        g["pts_linears"][i]["b"] = asdt(kgrads[bk][0], params["pts_linears"][i]["b"])
    g["alpha_linear"] = {"w": asdt(kgrads["wa"], params["alpha_linear"]["w"]),
                         "b": asdt(kgrads["ba"][0], params["alpha_linear"]["b"])}
    g["feature_linear"] = {"w": asdt(kgrads["wf"], params["feature_linear"]["w"]),
                           "b": asdt(kgrads["bf"][0], params["feature_linear"]["b"])}
    wv_emb = jnp.concatenate(
        [kgrads["wvx"], kgrads["wvs"], kgrads["wvc"]], axis=0)
    wv = jnp.concatenate([kgrads["wvf"], wv_emb[inv_d]], axis=0)
    g["views_linears"][0] = {
        "w": asdt(wv, params["views_linears"][0]["w"]),
        "b": asdt(kgrads["bv"][0], params["views_linears"][0]["b"]),
    }
    g["rgb_linear"] = {"w": asdt(kgrads["wr"], params["rgb_linear"]["w"]),
                       "b": asdt(kgrads["br"][0], params["rgb_linear"]["b"])}
    return g
