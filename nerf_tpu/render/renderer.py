"""The volume renderer: hierarchical coarse+fine NeRF rendering, jit-first.

This is the TPU-native re-design of the reference's
``src/models/nerf/renderer/volume_renderer.py``:

- ``render_rays``  — the whole pipeline for one static-size ray batch
  (coarse sample -> query -> composite -> importance sample -> merge-sort ->
  fine query -> composite), pure function of (params, rays, rng).
  Matches reference ``_render_pytorch`` (:109-216) chunk-body math.
- ``render_image`` — whole-image rendering as a ``lax.map`` over static ray
  tiles (the analog of the reference's 2048-ray chunk loop, :147-154, but a
  single compiled program).
- ESS (empty-space skipping) via ``occupancy.sample_coarse_with_ess`` and
  ERT (early ray termination) via masked compositing — static shapes, no
  data-dependent control flow.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.encoders import freq_encode, freq_out_dim
from ..models.nerf_mlp import apply_nerf_mlp
from . import occupancy as occ
from .composite import composite
from .rays import image_rays
from .sampling import sample_coarse, sample_pdf


@dataclasses.dataclass(frozen=True)
class RenderOptions:
    """Static (hashable) render configuration — safe to close over in jit."""

    n_samples: int = 64
    n_importance: int = 128
    near: float = 2.0
    far: float = 6.0
    perturb: float = 1.0
    raw_noise_std: float = 0.0
    white_bkgd: bool = True
    use_viewdirs: bool = True
    lindisp: bool = False
    enable_ert: bool = True
    ert_threshold: float = 0.01
    enable_ess: bool = True
    # Masked compaction: evaluate the network only for samples that pass
    # the skip mask, gathered into a static-capacity buffer (fraction of
    # total points). 0 = off. Kept samples beyond capacity fall back to
    # empty (sigma=0), so keep headroom above the expected kept rate.
    # - marched path (render/marched.py): the mask folds in ERT-terminated
    #   rays AND empty voxels per block, so both optimizations become real
    #   FLOP savings (reference's compacted DDA, SURVEY §3.4).
    # - hierarchical path: applies to the FINE pass only (75% of the work);
    #   mask = occupancy AND coarse-transmittance >= ert_threshold, so the
    #   kept fraction stays well below 1 even though ESS refocusing makes
    #   nearly every sample land in occupied space. The coarse pass stays
    #   dense (refocused samples are ~all occupied by construction).
    ess_compaction: float = 0.0
    # network family: "nerf" (coarse+fine big MLP) or "kilonerf" (voxel-
    # routed tiny MLPs, ops/kilonerf.py — the reference's network_eval.cu /
    # multimatmul.cu fast path as a first-class network_module)
    network_type: str = "nerf"
    kilo_grid_size: int = 16
    kilo_hidden: int = 32
    kilo_capacity_factor: float = 2.0
    kilo_dispatch_rounds: int = 1
    xyz_freqs: int = 10
    dir_freqs: int = 4
    # xyz encoder: "frequency" (reference default) or "hashgrid" (instant-
    # NGP style multi-res hash, models/hashgrid.py)
    xyz_encoder_type: str = "frequency"
    hash_levels: int = 16
    hash_features: int = 2
    hash_log2_size: int = 19
    hash_base_res: int = 16
    hash_scale: float = 1.3819
    # table dtype: bf16 halves the gather time (TPU gathers are scalar-
    # latency bound; see models/hashgrid.py) and matches tcnn's fp16 tables
    hash_dtype: str = "bfloat16"
    # table layout: "corner" (instant-NGP parity, 8 narrow gathers per
    # point-level) or "cellpack" (TPU-native: one wide row per point-level
    # carrying all 8 corner features — see models/hashgrid.init_hashgrid)
    hash_layout: str = "corner"
    # density activation: "relu" (reference parity) or "softplus" (required
    # for hash-encoder models — see composite.density_activation)
    sigma_activation: str = "relu"
    mlp_depth: int = 8
    mlp_width: int = 256
    skips: Tuple[int, ...] = (4,)
    compute_dtype: str = "bfloat16"
    tile_rays: int = 8192
    use_pallas: bool = True
    # use the Pallas integration kernel (ops/integrate.py) for compositing
    # on TPU (+9% end-to-end, measured; legal in training too — its custom
    # VJP recomputes the XLA composite backward, grad-parity tested in
    # tests/test_integrate_kernel.py). Default ON: best-known config.
    # Runtime-gated to TPU backends / noise-free compositing below.
    use_pallas_integrate: bool = True
    # Detach coarse weights from the fine-sampling CDF (original-NeRF
    # semantics). The reference does NOT detach (volume_renderer.py:239-268)
    # which lets the fine loss push the coarse model into a degenerate
    # all-empty solution during training (observed: coarse collapses to
    # predicting background after ~1 epoch). Parity tests set False.
    detach_fine_sampling: bool = True

    @property
    def input_ch(self) -> int:
        if self.xyz_encoder_type == "hashgrid":
            return self.hash_levels * self.hash_features
        return freq_out_dim(3, self.xyz_freqs)

    @property
    def input_ch_views(self) -> int:
        return freq_out_dim(3, self.dir_freqs)

    @classmethod
    def from_cfg(cls, cfg) -> "RenderOptions":
        ta = cfg.task_arg
        xyz_enc = cfg.network.xyz_encoder
        hash_kwargs = {}
        if xyz_enc.get("type", "frequency") in ("hashgrid", "grid_hash"):
            hash_kwargs = dict(
                xyz_encoder_type="hashgrid",
                hash_levels=int(xyz_enc.get("n_levels", 16)),
                hash_features=int(xyz_enc.get("n_features", 2)),
                hash_log2_size=int(xyz_enc.get("log2_hashmap_size", 19)),
                hash_base_res=int(xyz_enc.get("base_resolution", 16)),
                hash_scale=float(xyz_enc.get("per_level_scale", 1.3819)),
                hash_dtype=str(xyz_enc.get("dtype", "bfloat16")),
                hash_layout=str(xyz_enc.get("layout", "corner")),
            )
        kilo = cfg.get("kilo", {})
        return cls(
            **hash_kwargs,
            network_type=str(cfg.get("network_module", "nerf")),
            kilo_grid_size=int(kilo.get("grid_size", 16)),
            kilo_hidden=int(kilo.get("hidden", 32)),
            kilo_capacity_factor=float(kilo.get("capacity_factor", 2.0)),
            kilo_dispatch_rounds=int(kilo.get("dispatch_rounds", 1)),
            n_samples=int(ta.N_samples),
            n_importance=int(ta.N_importance),
            near=float(cfg.get("near", 2.0)),
            far=float(cfg.get("far", 6.0)),
            perturb=float(ta.perturb),
            raw_noise_std=float(ta.raw_noise_std),
            white_bkgd=bool(ta.white_bkgd),
            use_viewdirs=bool(ta.use_viewdirs),
            lindisp=bool(ta.lindisp),
            enable_ert=bool(cfg.get("enable_ert", True)),
            ert_threshold=float(cfg.get("ert_threshold", 0.01)),
            enable_ess=bool(cfg.get("enable_ess", True)),
            # "auto" -> -1.0 sentinel: resolved per checkpoint by
            # calibrate_compaction (resolve_compaction) before rendering
            ess_compaction=(
                -1.0 if str(cfg.get("ess_compaction", 0.0)) == "auto"
                else float(cfg.get("ess_compaction", 0.0))),
            xyz_freqs=int(xyz_enc.get("freq", 10)),
            dir_freqs=int(cfg.network.dir_encoder.freq),
            sigma_activation=str(cfg.network.get("sigma_activation", "relu")),
            mlp_depth=int(cfg.network.nerf.D),
            mlp_width=int(cfg.network.nerf.W),
            skips=tuple(cfg.network.nerf.skips),
            compute_dtype=str(cfg.network.get("dtype", "bfloat16")),
            tile_rays=int(cfg.get("render_tile_rays", 8192)),
            use_pallas=bool(cfg.get("use_pallas_kernels", True)),
            use_pallas_integrate=bool(cfg.get("use_pallas_integrate", True)),
        )


def query_network_xla(
    params: Any,
    pts: jnp.ndarray,
    viewdirs: Optional[jnp.ndarray],
    opts: RenderOptions,
) -> jnp.ndarray:
    """Reference math in pure XLA: freq-encode points (+dirs), run the MLP.

    pts: [N, S, 3]; viewdirs: [N, 3] or None -> raw [N, S, 4].
    (Analog of reference ``_query_network`` volume_renderer.py:270-284, minus
    the chunking — XLA tiles the matmuls itself.)
    """
    n, s, _ = pts.shape
    if opts.xyz_encoder_type == "hashgrid":
        from ..models.hashgrid import hashgrid_encode

        emb = hashgrid_encode(
            params["xyz_encoder"], pts.reshape(-1, 3),
            base_resolution=opts.hash_base_res,
            per_level_scale=opts.hash_scale,
            bbox_min=-2.0, bbox_max=2.0,
            layout=opts.hash_layout,
        )
    else:
        emb = freq_encode(pts.reshape(-1, 3), opts.xyz_freqs)
    if opts.use_viewdirs and viewdirs is not None:
        dirs = jnp.broadcast_to(viewdirs[:, None, :], (n, s, 3)).reshape(-1, 3)
        emb = jnp.concatenate([emb, freq_encode(dirs, opts.dir_freqs)], axis=-1)
    raw = apply_nerf_mlp(
        params,
        emb,
        input_ch=opts.input_ch,
        skips=opts.skips,
        use_viewdirs=opts.use_viewdirs,
        compute_dtype=jnp.dtype(opts.compute_dtype),
    )
    return raw.reshape(n, s, 4)


def kilo_config_from_opts(opts: RenderOptions):
    from ..ops.kilonerf import KiloConfig

    return KiloConfig(
        grid_size=opts.kilo_grid_size,
        hidden=opts.kilo_hidden,
        xyz_freqs=opts.xyz_freqs,
        dir_freqs=opts.dir_freqs,
        capacity_factor=opts.kilo_capacity_factor,
        dispatch_rounds=opts.kilo_dispatch_rounds,
    )


def get_query_fn(opts: RenderOptions) -> Callable:
    if opts.network_type == "kilonerf":
        from ..ops.kilonerf import query_network_kilonerf

        kcfg = kilo_config_from_opts(opts)

        def kilo_query(params, pts, viewdirs, o):
            if viewdirs is None:  # arch always consumes dirs
                viewdirs = jnp.zeros((pts.shape[0], 3), pts.dtype)
            return query_network_kilonerf(params, pts, viewdirs, o, kcfg)

        return kilo_query
    # Pallas TPU kernels only lower on TPU backends — allowlist the real
    # platform names ("tpu" direct-attached, "axon" = this repo's tunnel
    # PJRT plugin) rather than denylisting cpu/gpu (ADVICE r4: an unknown
    # backend, e.g. metal, must fall back to XLA, not crash in Mosaic).
    # The fused kernel bakes the frequency encoding into row-permuted
    # weights, so any other xyz encoder (hashgrid) must take the XLA path.
    if (
        opts.use_pallas
        and opts.xyz_encoder_type == "frequency"
        and jax.default_backend() in ("tpu", "axon")
    ):
        try:
            from ..ops.fused_mlp import query_network_pallas

            return query_network_pallas
        except Exception:  # pragma: no cover - fallback parity with reference
            return query_network_xla
    return query_network_xla


def query_masked_compacted(
    query_fn: Callable,
    params: Any,
    pts: jnp.ndarray,
    viewdirs: Optional[jnp.ndarray],
    opts: RenderOptions,
    mask: jnp.ndarray,
    cap: int,
) -> jnp.ndarray:
    """Masked compaction (the TPU analog of the reference's compacted DDA
    query generation, generate_inputs.cu:60-193): gather samples where
    ``mask`` is True into a fixed-capacity buffer via cumsum indexing, run
    the network only on those, scatter back. Masked-off / over-capacity
    samples return raw 0 (=> alpha 0). Static shapes throughout.

    pts [N,S,3], viewdirs [N,3] or None, mask [N,S] -> raw [N,S,4].
    """
    n, s, _ = pts.shape
    P = n * s
    if cap >= P:
        return query_fn(params, pts, viewdirs, opts)

    flat_pts = pts.reshape(P, 3)
    flat_mask = mask.reshape(P)
    # stable compaction index: kept point i -> slot cumsum(mask)[i]-1
    slot = jnp.cumsum(flat_mask.astype(jnp.int32)) - 1
    target = jnp.where(flat_mask & (slot < cap), slot, cap)  # cap = OOB drop
    gather_idx = jnp.zeros((cap,), jnp.int32).at[target].set(
        jnp.arange(P, dtype=jnp.int32), mode="drop"
    )

    pts_c = flat_pts[gather_idx]  # [cap, 3]
    if viewdirs is not None:
        dirs_flat = jnp.broadcast_to(
            viewdirs[:, None, :], (n, s, 3)).reshape(P, 3)
        dirs_c = dirs_flat[gather_idx][:, None, :]  # [cap, 1, 3] -> viewdirs arg
        raw_c = query_fn(params, pts_c[:, None, :], dirs_c[:, 0, :], opts)
    else:
        raw_c = query_fn(params, pts_c[:, None, :], None, opts)
    raw_c = raw_c.reshape(cap, 4)

    # un-compact: point i (kept, in capacity) reads raw_c[slot[i]]; dropped
    # samples fill with raw that maps to exactly-zero density under every
    # sigma activation (rgb raw is irrelevant once the weight is 0)
    from .composite import EMPTY_SIGMA_RAW

    empty_raw = jnp.asarray([0.0, 0.0, 0.0, EMPTY_SIGMA_RAW], raw_c.dtype)
    keep = (flat_mask & (slot < cap))[:, None]
    raw = jnp.where(keep, raw_c[jnp.clip(slot, 0, cap - 1)], empty_raw)
    return raw.reshape(n, s, 4)


def compaction_capacity(n_points: int, fraction: float) -> int:
    cap = int(n_points * fraction)
    return max(256, ((cap + 255) // 256) * 256)


def query_with_compaction(
    query_fn: Callable,
    params: Any,
    pts: jnp.ndarray,
    viewdirs: Optional[jnp.ndarray],
    opts: RenderOptions,
    grid: occ.OccupancyGrid,
) -> jnp.ndarray:
    """ESS compaction over an occupancy mask (hierarchical-path adapter)."""
    n, s, _ = pts.shape
    cap = compaction_capacity(n * s, opts.ess_compaction)
    occ_mask = occ.query(grid, pts.reshape(-1, 3)).reshape(n, s)
    return query_masked_compacted(
        query_fn, params, pts, viewdirs, opts, occ_mask, cap)


def fine_pass_mask(
    grid: occ.OccupancyGrid,
    pts_f: jnp.ndarray,
    z_vals: jnp.ndarray,
    z_all: jnp.ndarray,
    coarse_weights: jnp.ndarray,
    opts: RenderOptions,
) -> jnp.ndarray:
    """[N, Sf] keep-mask for fine-pass compaction: occupancy AND (with ERT)
    coarse-transmittance >= ert_threshold at each fine z. Shared between
    the render path and calibrate_compaction."""
    mask = occ.query(grid, pts_f.reshape(-1, 3)).reshape(z_all.shape)
    if opts.enable_ert:
        # T after coarse sample i is 1 - sum_{j<=i} w_j; step-wise
        # estimate at each fine z from the preceding coarse sample
        cum_w = jnp.cumsum(coarse_weights, axis=-1)
        idx = jax.vmap(jnp.searchsorted)(z_vals, z_all)  # [N, Sf]
        t_est = 1.0 - jnp.take_along_axis(
            cum_w, jnp.maximum(idx - 1, 0), axis=-1)
        t_est = jnp.where(idx > 0, t_est, 1.0)
        mask = mask & (jax.lax.stop_gradient(t_est) >= opts.ert_threshold)
    return mask


def calibrate_compaction(
    params: Dict[str, Any],
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    key: jax.Array,
    opts: RenderOptions,
    grid: occ.OccupancyGrid,
    margin: float = 1.25,
    disable_above: float = 0.30,
) -> float:
    """Capacity-aware compaction (round 5): measure the ACTUAL fine-pass
    kept rate of this checkpoint on a probe ray batch and return a safe
    ``ess_compaction`` fraction — or 0.0 when compaction cannot help.

    The static-fraction knob was measured harmful whenever the kept rate
    exceeded the guessed capacity (hash eval 12.72 dB, refocused marched
    PSNR 17, r2 SSIM 0.76 — docs/PERF.md): over-capacity samples are
    DROPPED, not deferred. Deriving the fraction from the probe batch's
    measured kept rate (x ``margin`` headroom for batch-to-batch variance,
    rounded up to the capacity granularity) makes the operating point
    quality-neutral by construction; when the safe fraction clears
    ``disable_above``, 0.0 is returned because the dense path is faster.
    The 0.30 default is a measured cost model, not a guess: on the trained
    lego checkpoint the calibrated fraction 0.767 rendered at 36.7k rays/s
    vs 170.3k dense (round-5 ``bench.py --compaction auto``) — the
    compacted query's cumsum/gather/scatter overhead makes its per-point
    cost ~3.5x the dense path's, so compaction only wins when it skips the
    large majority of samples. Host-side, once per checkpoint.
    Reference analog: the compacted DDA exists to SKIP work
    (generate_inputs.cu:60-193) — this keeps it a skip, never a drop.
    """
    import dataclasses

    import numpy as np

    opts_dense = dataclasses.replace(opts, ess_compaction=0.0)
    out = render_rays(params, rays_o, rays_d, key, opts_dense, grid=grid,
                      train=False)
    if "fine_z_vals" not in out:
        return 0.0
    z_vals = out["coarse_z_vals"]
    z_all = out["fine_z_vals"]
    pts_f = rays_o[..., None, :] + rays_d[..., None, :] * z_all[..., None]
    mask = fine_pass_mask(grid, pts_f, z_vals, z_all, out["coarse_weights"],
                          opts)
    kept = float(np.asarray(jnp.mean(mask.astype(jnp.float32))))
    n_pts = int(z_all.shape[0]) * int(z_all.shape[1])
    frac = min(1.0, margin * kept)
    # round up to what compaction_capacity will actually allocate
    frac = compaction_capacity(n_pts, frac) / n_pts
    if frac >= disable_above:
        return 0.0
    return frac


def resolve_compaction(
    opts: RenderOptions,
    params: Dict[str, Any],
    grid: Optional[occ.OccupancyGrid],
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    key: Optional[jax.Array] = None,
) -> RenderOptions:
    """Resolve ``ess_compaction: auto`` (the -1.0 sentinel) into a
    calibrated static fraction for this checkpoint — host-side, before any
    jit (the fraction is a static field). Pass a representative probe ray
    batch (e.g. one render tile of a real camera)."""
    import dataclasses

    if opts.ess_compaction >= 0.0:
        return opts
    if grid is None or not opts.enable_ess:
        return dataclasses.replace(opts, ess_compaction=0.0)
    frac = calibrate_compaction(
        params, rays_o, rays_d,
        jax.random.PRNGKey(0) if key is None else key, opts, grid)
    print(f"# ess_compaction auto -> {frac:.3f} (calibrated)")
    return dataclasses.replace(opts, ess_compaction=frac)


def render_rays(
    params: Dict[str, Any],
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    key: jax.Array,
    opts: RenderOptions,
    grid: Optional[occ.OccupancyGrid] = None,
    train: bool = False,
    query_fn: Optional[Callable] = None,
) -> Dict[str, jnp.ndarray]:
    """Hierarchical render of a [N, 3] ray batch.

    params: {"coarse": mlp_params, "fine": mlp_params}.
    Returns the reference's output surface: rgb_map_0/disp_map_0/acc_map_0/
    depth_map_0 (coarse) and rgb_map/disp_map/acc_map/depth_map (fine).
    """
    if query_fn is None:
        query_fn = get_query_fn(opts)
    n_rays = rays_o.shape[0]
    k_coarse, k_fine, k_noise_c, k_noise_f = jax.random.split(key, 4)
    viewdirs = rays_d if opts.use_viewdirs else None

    # 1. coarse sampling (with optional ESS refocusing)
    if opts.enable_ess and grid is not None:
        z_vals = occ.sample_coarse_with_ess(
            k_coarse, grid, rays_o, rays_d,
            opts.n_samples, opts.near, opts.far,
            perturb=opts.perturb, lindisp=opts.lindisp,
        )
    else:
        z_vals = sample_coarse(
            k_coarse, n_rays, opts.n_samples, opts.near, opts.far,
            perturb=opts.perturb, lindisp=opts.lindisp,
        )
    pts = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., None]

    # 2. coarse network query + compositing. The coarse pass stays dense:
    # ESS refocusing (step 1) already concentrates its samples into
    # occupied space, so an occupancy-mask compaction would keep ~100% of
    # them and only risk overflow holes.
    # Compaction is eval-only (like the reference's compacted DDA pipeline,
    # generate_inputs.cu:60-193 — an inference path). In TRAINING the kept
    # rate routinely exceeds the capacity fraction: ESS refocusing puts the
    # coarse (and hence fine) samples inside occupied voxels by design, and
    # the early-training transmittance never crosses the ERT threshold — so
    # the global cumsum compaction drops every sample of every ray past the
    # capacity prefix. Those rays composite to pure background with ZERO
    # gradient to the fine model: the round-1 "hashgrid fine model never
    # trains" failure (lego_hashgrid sets ess_compaction 0.35).
    use_compaction = (
        opts.enable_ess and grid is not None and opts.ess_compaction > 0.0
        and not train
    )
    raw = query_fn(params["coarse"], pts, viewdirs, opts)
    ert = opts.ert_threshold if opts.enable_ert else None

    # compositing backend: the Pallas integration kernel (noise-free;
    # relu/softplus; TPU only). Legal in training too — its custom VJP
    # recomputes the XLA composite backward (ops/integrate.py).
    if (opts.use_pallas_integrate
            and opts.raw_noise_std == 0.0
            and opts.sigma_activation in ("relu", "softplus")
            and jax.default_backend() in ("tpu", "axon")):
        from ..ops.integrate import composite_pallas

        def composite_fn(raw_, z_, noise_key):
            return composite_pallas(
                raw_, z_, rays_d, white_bkgd=opts.white_bkgd,
                ert_threshold=0.0 if ert is None else ert,
                sigma_activation=opts.sigma_activation)
    else:
        def composite_fn(raw_, z_, noise_key):
            return composite(
                raw_, z_, rays_d,
                raw_noise_std=opts.raw_noise_std, noise_key=noise_key,
                white_bkgd=opts.white_bkgd, ert_threshold=ert,
                sigma_activation=opts.sigma_activation)

    out_c = composite_fn(raw, z_vals, k_noise_c)
    ret = {
        "rgb_map_0": out_c["rgb_map"],
        "disp_map_0": out_c["disp_map"],
        "acc_map_0": out_c["acc_map"],
        "depth_map_0": out_c["depth_map"],
    }

    # 3. hierarchical fine pass
    if opts.n_importance > 0:
        z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        w_fine = out_c["weights"][..., 1:-1]
        if opts.detach_fine_sampling:
            w_fine = jax.lax.stop_gradient(w_fine)
            z_mid = jax.lax.stop_gradient(z_mid)
        z_fine = sample_pdf(
            k_fine, z_mid, w_fine,
            opts.n_importance, deterministic=not train,
        )
        z_all = jnp.sort(jnp.concatenate([z_vals, z_fine], axis=-1), axis=-1)
        pts_f = rays_o[..., None, :] + rays_d[..., None, :] * z_all[..., None]
        if use_compaction:
            # Unified fine-pass compaction (the hierarchical analog of the
            # reference's compacted DDA pipeline): skip fine queries in
            # empty voxels AND past the depth where the coarse pass says
            # transmittance has fallen below the ERT threshold — samples the
            # ERT composite would zero anyway. Terminated samples drop out
            # of the kept set, so the capacity survives ESS refocusing.
            # Set the fraction from calibrate_compaction (capacity-aware,
            # round 5) — a static guess below the actual kept rate drops
            # real samples and collapses quality (measured, docs/PERF.md).
            mask = fine_pass_mask(grid, pts_f, z_vals, z_all,
                                  out_c["weights"], opts)
            cap = compaction_capacity(z_all.shape[0] * z_all.shape[1],
                                      opts.ess_compaction)
            raw_f = query_masked_compacted(
                query_fn, params["fine"], pts_f, viewdirs, opts, mask, cap)
        else:
            raw_f = query_fn(params["fine"], pts_f, viewdirs, opts)
        out_f = composite_fn(raw_f, z_all, k_noise_f)
        ret.update(
            rgb_map=out_f["rgb_map"],
            disp_map=out_f["disp_map"],
            acc_map=out_f["acc_map"],
            depth_map=out_f["depth_map"],
        )
        ret["fine_weights"] = out_f["weights"]
        ret["fine_z_vals"] = z_all
    ret["coarse_weights"] = out_c["weights"]
    ret["coarse_z_vals"] = z_vals
    return ret


@partial(
    jax.jit,
    static_argnames=("H", "W", "opts", "train", "with_aux"),
)
def render_image(
    params: Dict[str, Any],
    pose: jnp.ndarray,
    intrinsics: jnp.ndarray,
    key: jax.Array,
    H: int,
    W: int,
    opts: RenderOptions,
    grid: Optional[occ.OccupancyGrid] = None,
    train: bool = False,
    with_aux: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Render a full HxW image as one compiled program.

    Rays are processed in static tiles via ``lax.map`` (gradient-free path;
    for training use ray batches via ``render_rays``). Output maps reshaped
    to [H, W, ...] like reference ``_render_pytorch`` (:206-215).
    """
    rays_o, rays_d = image_rays(H, W, intrinsics, pose)
    n = H * W
    tile = min(opts.tile_rays, n)
    n_pad = (-n) % tile
    rays_o = jnp.pad(rays_o, ((0, n_pad), (0, 0)))
    rays_d = jnp.pad(
        rays_d, ((0, n_pad), (0, 0)), constant_values=1.0
    )  # pad dirs non-zero to keep norms finite
    n_tiles = (n + n_pad) // tile
    rays_o = rays_o.reshape(n_tiles, tile, 3)
    rays_d = rays_d.reshape(n_tiles, tile, 3)
    keys = jax.random.split(key, n_tiles)

    def tile_fn(args):
        ro, rd, k = args
        out = render_rays(params, ro, rd, k, opts, grid=grid, train=train)
        if not with_aux:
            out = {k2: v for k2, v in out.items() if k2.endswith("map") or k2.endswith("_0")}
        return out

    out = jax.lax.map(tile_fn, (rays_o, rays_d, keys))
    ret = {}
    for k2, v in out.items():
        flat = v.reshape(n_tiles * tile, *v.shape[2:])[:n]
        if k2.startswith("rgb_map"):
            ret[k2] = flat.reshape(H, W, 3)
        elif k2.endswith("map") or k2.endswith("map_0"):
            ret[k2] = flat.reshape(H, W)
        else:
            ret[k2] = flat
    return ret
