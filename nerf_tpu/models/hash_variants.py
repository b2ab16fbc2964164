"""Hash-encoder variants for dynamic scenes.

Parity surface: reference ``src/models/encoding/hashencoder/hashgrid.py``
(:241-352): ``HashEncoder4d`` (xyzt hashed jointly), ``HashLatent``
(spatial hash features ++ per-frame latent code), ``Motion2d`` (three 2D
plane hashes behind a time-conditioned deformation MLP), ``HashEncoderCoef``
(softmax-coefficient blend of several spatial hash bases, coefficients from
an xyzt hash). All built on the D-dimensional hash grid in hashgrid.py.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .hashgrid import hashgrid_encode, hashgrid_out_dim, init_hashgrid
from .nerf_mlp import _linear_init


def _norm_time(xyzt: jnp.ndarray, num_frames: int) -> jnp.ndarray:
    """xyzt[..., 3] is a frame index; normalize to [0,1]."""
    t = xyzt[..., 3:] / jnp.maximum(num_frames - 1, 1)
    return jnp.concatenate([xyzt[..., :3], t], axis=-1)


# ---- HashEncoder4d: one 4D (xyzt) hash grid --------------------------------

def init_hash4d(key, num_frames: int = 60, **kwargs) -> Dict:
    return {"grid": init_hashgrid(key, **kwargs)}


def hash4d_encode(params: Dict, xyzt: jnp.ndarray, num_frames: int = 60,
                  base_resolution: int = 16, per_level_scale: float = 1.3819,
                  bbox_min: float = -2.0, bbox_max: float = 2.0) -> jnp.ndarray:
    x = _norm_time(xyzt, num_frames)
    # spatial dims normalized by bbox; time already in [0,1] -> rescale into
    # the same normalized cube the grid expects
    xt = jnp.concatenate(
        [x[..., :3],
         x[..., 3:] * (bbox_max - bbox_min) + bbox_min], axis=-1)
    return hashgrid_encode(params["grid"], xt,
                           base_resolution=base_resolution,
                           per_level_scale=per_level_scale,
                           bbox_min=bbox_min, bbox_max=bbox_max)


# ---- HashLatent: spatial hash ++ per-frame latent --------------------------

def init_hash_latent(key, num_frames: int = 60, latent_dim: int = 32,
                     **kwargs) -> Dict:
    k1, k2 = jax.random.split(key)
    return {
        "grid": init_hashgrid(k1, **kwargs),
        "latent_t": jax.random.uniform(
            k2, (num_frames, latent_dim), jnp.float32, -1e-4, 1e-4),
    }


def hash_latent_encode(params: Dict, xyzt: jnp.ndarray,
                       base_resolution: int = 16,
                       per_level_scale: float = 1.3819) -> jnp.ndarray:
    xyz_feat = hashgrid_encode(params["grid"], xyzt[..., :3],
                               base_resolution=base_resolution,
                               per_level_scale=per_level_scale)
    t_idx = jnp.clip(xyzt[..., 3].astype(jnp.int32), 0,
                     params["latent_t"].shape[0] - 1)
    return jnp.concatenate([xyz_feat, params["latent_t"][t_idx]], axis=-1)


# ---- HashEncoderCoef: coefficient-blended hash bases -----------------------

def init_hash_coef(key, basis_num: int = 6, coef_hidden: int = 64,
                   **kwargs) -> Dict:
    keys = jax.random.split(key, basis_num + 3)
    bases = [init_hashgrid(keys[i], **kwargs) for i in range(basis_num)]
    coef_grid = init_hashgrid(keys[basis_num], **kwargs)
    L = kwargs.get("n_levels", 16)
    F = kwargs.get("n_features", 2)
    in_dim = hashgrid_out_dim(L, F)
    return {
        "bases": bases,
        "coef_grid": coef_grid,
        "coef_l1": _linear_init(keys[basis_num + 1], in_dim, coef_hidden),
        "coef_l2": _linear_init(keys[basis_num + 2], coef_hidden, basis_num),
    }


def hash_coef_encode(params: Dict, xyzt: jnp.ndarray, num_frames: int = 60,
                     base_resolution: int = 16,
                     per_level_scale: float = 1.3819) -> jnp.ndarray:
    xt = _norm_time(xyzt, num_frames)
    xt4 = jnp.concatenate([xt[..., :3], xt[..., 3:] * 4.0 - 2.0], axis=-1)
    coef_emb = hashgrid_encode(params["coef_grid"], xt4,
                               base_resolution=base_resolution,
                               per_level_scale=per_level_scale)
    h = jax.nn.relu(coef_emb @ params["coef_l1"]["w"] + params["coef_l1"]["b"])
    coefs = jax.nn.softmax(h @ params["coef_l2"]["w"] + params["coef_l2"]["b"],
                           axis=-1)  # [N, B]
    embs = jnp.stack([
        hashgrid_encode(b, xyzt[..., :3], base_resolution=base_resolution,
                        per_level_scale=per_level_scale)
        for b in params["bases"]
    ], axis=1)  # [N, B, L*F]
    return jnp.sum(embs * coefs[..., None], axis=1)


# ---- Motion2d: deformed tri-plane hashes for dynamic 2D motion -------------

def init_motion2d(key, mlp_width: int = 128, mlp_depth: int = 7,
                  **kwargs) -> Dict:
    keys = jax.random.split(key, 3 + mlp_depth + 1)
    planes = [init_hashgrid(keys[i], **kwargs) for i in range(3)]
    layers = []
    dim = 4
    for i in range(mlp_depth):
        layers.append(_linear_init(keys[3 + i], dim, mlp_width))
        dim = mlp_width
    head = _linear_init(keys[3 + mlp_depth], mlp_width, 3)
    return {"planes": planes, "mlp": layers, "head": head}


def motion2d_encode(params: Dict, xyzt: jnp.ndarray, num_frames: int = 60,
                    base_resolution: int = 16,
                    per_level_scale: float = 1.3819,
                    bbox_min: float = -2.0, bbox_max: float = 2.0) -> jnp.ndarray:
    x = jnp.clip(xyzt[..., :3], bbox_min, bbox_max)
    x = (x - bbox_min) / (bbox_max - bbox_min)  # [0,1]
    t = xyzt[..., 3:] / jnp.maximum(num_frames - 1, 1)
    inp = jnp.concatenate([x, t], axis=-1)

    h = inp
    for layer in params["mlp"]:
        h = jax.nn.relu(h @ layer["w"] + layer["b"])
    delta = jax.nn.sigmoid(h @ params["head"]["w"] + params["head"]["b"])
    xyz_def = jnp.clip(x + 2.0 * delta - 1.0, 0.0, 1.0)
    # at t==0 (canonical) skip deformation, matching the reference (:276-285)
    xyz_use = jnp.where(t > 0, xyz_def, x)

    pairs = ((0, 1), (1, 2), (0, 2))
    feats = [
        hashgrid_encode(params["planes"][i], xyz_use[..., list(p)],
                        base_resolution=base_resolution,
                        per_level_scale=per_level_scale,
                        bbox_min=0.0, bbox_max=1.0)
        for i, p in enumerate(pairs)
    ]
    return jnp.concatenate(feats, axis=-1)
