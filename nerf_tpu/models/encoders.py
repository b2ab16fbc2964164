"""Positional (frequency / fourier-feature) encoding.

Behavioral parity target: reference ``src/models/encoding/freq.py`` with the
kwargs from ``src/models/encoding/__init__.py:7-18`` — include_input=True,
log-sampled bands 2**linspace(0, freq-1, freq), periodic fns [sin, cos].

Output channel layout (must match for weight-porting parity):
    [x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...]
i.e. per frequency the full input vector under sin then cos.
out_dim = d * (2*num_freqs + 1):  xyz 10 freqs -> 63, dir 4 freqs -> 27.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def freq_bands(num_freqs: int, log_sampling: bool = True) -> np.ndarray:
    max_freq = num_freqs - 1
    if log_sampling:
        return 2.0 ** np.linspace(0.0, max_freq, num_freqs)
    return np.linspace(2.0**0.0, 2.0**max_freq, num_freqs)


def freq_encode(x: jnp.ndarray, num_freqs: int, include_input: bool = True) -> jnp.ndarray:
    """Fourier-feature encode the last axis of ``x``.

    x: [..., d] -> [..., d*(2*num_freqs + int(include_input))]
    """
    bands = jnp.asarray(freq_bands(num_freqs), dtype=x.dtype)  # [F]
    # [..., F, d]: x scaled by each band
    xb = x[..., None, :] * bands[:, None]
    # per band: sin then cos, matching the reference's [sin, cos] fn order
    enc = jnp.concatenate([jnp.sin(xb), jnp.cos(xb)], axis=-1)  # [..., F, 2d]
    enc = enc.reshape(*x.shape[:-1], 2 * num_freqs * x.shape[-1])
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


def freq_out_dim(input_dim: int, num_freqs: int, include_input: bool = True) -> int:
    return input_dim * (2 * num_freqs + int(include_input))


def sh_encode(dirs: jnp.ndarray, degree: int = 4) -> jnp.ndarray:
    """Real spherical-harmonics basis of unit directions up to ``degree``
    (exclusive), out_dim = degree**2. (The reference lists a
    sphere_harmonics encoder type as a stub; this is the real basis.)"""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    out = [jnp.full_like(x, 0.28209479177387814)]  # l=0
    if degree > 1:
        out += [-0.4886025119029199 * y,
                0.4886025119029199 * z,
                -0.4886025119029199 * x]
    if degree > 2:
        xx, yy, zz, xy, yz, xz = x * x, y * y, z * z, x * y, y * z, x * z
        out += [1.0925484305920792 * xy,
                -1.0925484305920792 * yz,
                0.31539156525252005 * (2.0 * zz - xx - yy),
                -1.0925484305920792 * xz,
                0.5462742152960396 * (xx - yy)]
    if degree > 3:
        xx, yy, zz = x * x, y * y, z * z
        out += [-0.5900435899266435 * y * (3 * xx - yy),
                2.890611442640554 * x * y * z,
                -0.4570457994644658 * y * (4 * zz - xx - yy),
                0.3731763325901154 * z * (2 * zz - 3 * xx - 3 * yy),
                -0.4570457994644658 * x * (4 * zz - xx - yy),
                1.445305721320277 * z * (xx - yy),
                -0.5900435899266435 * x * (xx - 3 * yy)]
    return jnp.stack(out, axis=-1)


def sh_out_dim(degree: int = 4) -> int:
    return degree * degree


def get_encoder(enc_cfg, key=None):
    """Encoder factory mirroring reference ``src/models/encoding/__init__.py:6``.

    Returns ``(encode_fn, out_dim)`` for parameter-free encoders, or
    ``(params, encode_fn(params, x), out_dim)`` for learned ones
    (hashgrid / triplane, which need ``key``).
    """
    etype = enc_cfg["type"]
    if etype == "frequency":
        d, f = int(enc_cfg["input_dim"]), int(enc_cfg["freq"])
        return (lambda x: freq_encode(x, f)), freq_out_dim(d, f)
    if etype == "sphere_harmonics":
        deg = int(enc_cfg.get("degree", 4))
        return (lambda x: sh_encode(x, deg)), sh_out_dim(deg)
    if etype in ("hashgrid", "grid_hash", "cuda_hashgrid"):
        from .hashgrid import hashgrid_encode, hashgrid_out_dim, init_hashgrid

        L = int(enc_cfg.get("n_levels", 16))
        F = int(enc_cfg.get("n_features", 2))
        base = int(enc_cfg.get("base_resolution", 16))
        scale = float(enc_cfg.get("per_level_scale", 1.3819))
        layout = str(enc_cfg.get("layout", "corner"))
        params = init_hashgrid(
            key if key is not None else __import__("jax").random.PRNGKey(0),
            n_levels=L, n_features=F,
            log2_table_size=int(enc_cfg.get("log2_hashmap_size", 19)),
            base_resolution=base, per_level_scale=scale, layout=layout,
        )
        fn = lambda p, x: hashgrid_encode(p, x, base_resolution=base,
                                          per_level_scale=scale,
                                          layout=layout)
        return params, fn, hashgrid_out_dim(L, F)
    if etype in ("triplane", "cuda_triplane"):
        from .triplane import init_triplane, triplane_encode, triplane_out_dim

        R = int(enc_cfg.get("resolution", 128))
        F = int(enc_cfg.get("n_features", 16))
        params = init_triplane(
            key if key is not None else __import__("jax").random.PRNGKey(0),
            resolution=R, n_features=F,
        )
        return params, triplane_encode, triplane_out_dim(F)
    if etype in ("cuda_hashgrid_4d", "cuda_hashgrid_latent",
                 "cuda_hashgrid_coef", "cuda_motion2d"):
        return _get_dynamic_hash_encoder(etype, enc_cfg, key)
    if etype in ("dnerf", "dnerf_ngp_mlp", "dnerf_ngp_tensorf",
                 "cuda_dnerf_ngp_tensorf", "dnerf_mlp_tensorf"):
        return _get_dnerf_encoder(etype, enc_cfg, key)
    raise ValueError(f"unknown encoder type: {etype}")


def _hash_kwargs(enc_cfg) -> dict:
    return dict(
        n_levels=int(enc_cfg.get("n_levels", 16)),
        n_features=int(enc_cfg.get("n_features", 2)),
        log2_table_size=int(enc_cfg.get("log2_hashmap_size", 19)),
        base_resolution=int(enc_cfg.get("base_resolution", 16)),
        per_level_scale=float(enc_cfg.get("per_level_scale", 1.3819)),
    )


def _get_dynamic_hash_encoder(etype, enc_cfg, key):
    """Dynamic-scene hash variants (reference hashencoder/hashgrid.py:241-352);
    encode takes xyzt [..., 4] with frame index in the last channel."""
    import jax as _jax
    from functools import partial

    from . import hash_variants as hv
    from .hashgrid import hashgrid_out_dim

    key = key if key is not None else _jax.random.PRNGKey(0)
    kw = _hash_kwargs(enc_cfg)
    init_kw = dict(n_levels=kw["n_levels"], n_features=kw["n_features"],
                   log2_table_size=kw["log2_table_size"])
    enc_kw = dict(base_resolution=kw["base_resolution"],
                  per_level_scale=kw["per_level_scale"])
    nf = int(enc_cfg.get("num_frames", 60))
    base_dim = hashgrid_out_dim(kw["n_levels"], kw["n_features"])
    if etype == "cuda_hashgrid_4d":
        params = hv.init_hash4d(key, num_frames=nf, **init_kw)
        return params, partial(hv.hash4d_encode, num_frames=nf,
                               **enc_kw), base_dim
    if etype == "cuda_hashgrid_latent":
        latent_dim = int(enc_cfg.get("latent_dim", 32))
        params = hv.init_hash_latent(key, num_frames=nf,
                                     latent_dim=latent_dim, **init_kw)
        return params, partial(hv.hash_latent_encode,
                               **enc_kw), base_dim + latent_dim
    if etype == "cuda_hashgrid_coef":
        params = hv.init_hash_coef(
            key, basis_num=int(enc_cfg.get("basis_num", 6)),
            coef_hidden=int(enc_cfg.get("coef_hidden", 64)), **init_kw)
        return params, partial(hv.hash_coef_encode, num_frames=nf,
                               **enc_kw), base_dim
    # cuda_motion2d: three deformed 2D plane hashes
    params = hv.init_motion2d(
        key, mlp_width=int(enc_cfg.get("deform_width", 128)),
        mlp_depth=int(enc_cfg.get("deform_depth", 7)), **init_kw)
    return params, partial(hv.motion2d_encode, num_frames=nf,
                           **enc_kw), 3 * base_dim


def _get_dnerf_encoder(etype, enc_cfg, key):
    """D-NeRF family: time-conditioned deformation in front of a spatial
    encoder (reference encoding/__init__.py dnerf_* dispatch). encode takes
    (pts [..., 3], t) with t in [0, 1]."""
    import jax as _jax

    from .dnerf import deformed_encoder, init_deformation

    key = key if key is not None else _jax.random.PRNGKey(0)
    k_def, k_sp = _jax.random.split(key)
    xyz_freqs = int(enc_cfg.get("freq", 10))
    time_freqs = int(enc_cfg.get("time_freq", 4))
    deform = init_deformation(
        k_def, xyz_freqs=xyz_freqs, time_freqs=time_freqs,
        W=int(enc_cfg.get("deform_width", 128)),
        D=int(enc_cfg.get("deform_depth", 4)),
    )
    if etype == "dnerf":  # deformation + frequency spatial encoding
        spatial = lambda x: freq_encode(x, xyz_freqs)
        out_dim = freq_out_dim(3, xyz_freqs)
        params = {"deform": deform}
        fn = lambda p, pts, t: deformed_encoder(
            p["deform"], spatial, xyz_freqs, time_freqs)(pts, t)
        return params, fn, out_dim
    if etype in ("dnerf_ngp_mlp", "dnerf_ngp_tensorf",
                 "cuda_dnerf_ngp_tensorf"):  # deformation + hash grid
        from .hashgrid import hashgrid_encode, hashgrid_out_dim, init_hashgrid

        kw = _hash_kwargs(enc_cfg)
        grid = init_hashgrid(
            k_sp, n_levels=kw["n_levels"], n_features=kw["n_features"],
            log2_table_size=kw["log2_table_size"])
        out_dim = hashgrid_out_dim(kw["n_levels"], kw["n_features"])
        params = {"deform": deform, "grid": grid}
        fn = lambda p, pts, t: deformed_encoder(
            p["deform"],
            lambda x: hashgrid_encode(
                p["grid"], x, base_resolution=kw["base_resolution"],
                per_level_scale=kw["per_level_scale"]),
            xyz_freqs, time_freqs)(pts, t)
        return params, fn, out_dim
    # dnerf_mlp_tensorf: deformation + tri-plane spatial encoding
    from .triplane import init_triplane, triplane_encode, triplane_out_dim

    R = int(enc_cfg.get("resolution", 128))
    F = int(enc_cfg.get("n_features", 16))
    plane = init_triplane(k_sp, resolution=R, n_features=F)
    params = {"deform": deform, "planes": plane}
    fn = lambda p, pts, t: deformed_encoder(
        p["deform"], lambda x: triplane_encode(p["planes"], x),
        xyz_freqs, time_freqs)(pts, t)
    return params, fn, triplane_out_dim(F)
