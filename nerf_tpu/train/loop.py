"""The training loop: epochs of compiled step-chunks + checkpoint/eval cadence.

Parity surface: reference ``train.py:31-87`` + ``trainer.py`` — epoch = ep_iter
steps, save every save_ep / save_latest_ep, eval every eval_ep, resume support,
recorder logging with smoothed windows and ETA.
TPU-native differences: the inner loop is a ``lax.scan`` of whole train steps
(on-device data sampling, no host round-trips), and the ESS occupancy grid is
rebuilt periodically with the KiloNeRF subgrid method instead of ad-hoc
scatter updates.
"""
from __future__ import annotations

import math
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.blender import make_dataset
from ..parallel.mesh import init_distributed, make_mesh, replicate
from ..parallel.multihost import is_main_process
from ..models.encoders import freq_encode
from ..models.nerf_mlp import apply_nerf_mlp, init_nerf_mlp
from ..render import occupancy as occ
from ..render.composite import density_activation
from ..render.renderer import RenderOptions, render_image
from .checkpoint import load_checkpoint, save_checkpoint, wipe_dir
from .optim import make_optimizer
from .recorder import Recorder
from .state import init_state, train_steps


def init_nerf_params(key, opts: RenderOptions):
    if opts.network_type == "kilonerf":
        from ..ops.kilonerf import init_kilonerf
        from ..render.renderer import kilo_config_from_opts

        p = init_kilonerf(key, kilo_config_from_opts(opts))
        return {"coarse": p, "fine": p}  # one shared voxel-routed model
    kc, kf = jax.random.split(key)
    kwargs = dict(
        D=opts.mlp_depth, W=opts.mlp_width,
        input_ch=opts.input_ch, input_ch_views=opts.input_ch_views,
        skips=opts.skips, use_viewdirs=opts.use_viewdirs,
    )
    params = {
        "coarse": init_nerf_mlp(kc, **kwargs),
        "fine": init_nerf_mlp(kf, **kwargs),
    }
    if opts.xyz_encoder_type == "hashgrid":
        from ..models.hashgrid import init_hashgrid

        kc2, kf2 = jax.random.split(jax.random.fold_in(key, 1))
        hash_kwargs = dict(
            n_levels=opts.hash_levels, n_features=opts.hash_features,
            log2_table_size=opts.hash_log2_size,
            base_resolution=opts.hash_base_res,
            per_level_scale=opts.hash_scale,
            dtype=jnp.dtype(opts.hash_dtype),
            layout=opts.hash_layout,
        )
        params["coarse"]["xyz_encoder"] = init_hashgrid(kc2, **hash_kwargs)
        params["fine"]["xyz_encoder"] = init_hashgrid(kf2, **hash_kwargs)
        # hash features start ~1e-4, so sigma_raw is ~ the alpha bias for
        # every point; a negative bias makes relu(sigma) identically dead
        # (zero gradient everywhere). Start slightly positive.
        for m in ("coarse", "fine"):
            b = params[m]["alpha_linear"]["b"]
            params[m]["alpha_linear"]["b"] = jnp.full_like(b, 0.1)
    return params


def make_density_fn(params, opts: RenderOptions):
    """[M,3] -> relu(sigma) using the coarse model (for grid rebuilds)."""
    if opts.network_type == "kilonerf":
        from ..ops.kilonerf import kilonerf_eval
        from ..render.renderer import kilo_config_from_opts

        kcfg = kilo_config_from_opts(opts)

        @jax.jit
        def kilo_density(pts):
            dirs = jnp.zeros_like(pts)
            return density_activation(
                kilonerf_eval(params, pts, dirs, kcfg)[..., 3],
                opts.sigma_activation)

        return kilo_density

    @jax.jit
    def density(pts):
        if opts.xyz_encoder_type == "hashgrid":
            from ..models.hashgrid import hashgrid_encode

            emb = hashgrid_encode(
                params["xyz_encoder"], pts,
                base_resolution=opts.hash_base_res,
                per_level_scale=opts.hash_scale,
                bbox_min=-2.0, bbox_max=2.0,
                layout=opts.hash_layout,
            )
        else:
            emb = freq_encode(pts, opts.xyz_freqs)
        zeros_dirs = jnp.zeros((pts.shape[0], opts.input_ch_views), pts.dtype)
        x = jnp.concatenate([emb, zeros_dirs], axis=-1)
        raw = apply_nerf_mlp(
            params, x, input_ch=opts.input_ch, skips=opts.skips,
            use_viewdirs=opts.use_viewdirs,
            compute_dtype=jnp.dtype(opts.compute_dtype),
        )
        return density_activation(raw[..., 3], opts.sigma_activation)

    return density


def check_finite_stats(host_stats: dict, epoch: int = 0, iteration: int = 0):
    """Anomaly guard between compiled step-chunks.

    The reference keeps ``torch.autograd.set_detect_anomaly(True)`` always
    on (train.py:23); the TPU analog of per-op anomaly tracking is
    ``jax_debug_nans`` (opt-in via cfg.detect_anomaly — it forces eager
    re-execution on failure and is far too slow to leave always-on). This
    cheap guard runs on every host sync instead: a non-finite loss raises
    ``FloatingPointError``, which ``--auto_restart`` converts into a
    resume from the latest checkpoint.
    """
    # psnr = -10*log10(mse) is legitimately +inf when a step's MSE is exactly
    # 0 (tiny scenes / img-fit); only NaN or -inf psnr is anomalous.
    bad = {
        k: v for k, v in host_stats.items()
        if not math.isfinite(v) and not (k.endswith("psnr") and v > 0)
    }
    if bad:
        raise FloatingPointError(
            f"non-finite training stats at epoch {epoch} iter {iteration}: "
            f"{bad}")


def make_train_mesh(cfg, n_rays: int):
    """Data-parallel mesh for the trainer (the reference's NCCL/DDP init,
    train.py:116-120 / trainer.py:14-21, as a jax.sharding.Mesh).

    Spans every addressable device whose count divides the ray batch
    (size 1 = single-chip behavior); ``cfg.mesh_devices`` caps it."""
    if bool(cfg.get("distributed", False)):
        init_distributed()
    n_dev = len(jax.devices())
    want = cfg.get("mesh_devices", "all")
    if want != "all":
        n_dev = min(n_dev, int(want))
    while n_rays % n_dev != 0:
        n_dev -= 1
    return make_mesh(n_dev)


def train(cfg, max_epochs: Optional[int] = None):
    opts = RenderOptions.from_cfg(cfg)
    seed = int(cfg.get("seed", 0))
    key = jax.random.PRNGKey(seed)
    k_init, k_grid, k_train = jax.random.split(key, 3)

    n_rays = int(cfg.task_arg.N_rays)
    mesh = make_train_mesh(cfg, n_rays)
    if len(mesh.devices.flat) > 1:
        print(f"data-parallel mesh: {len(mesh.devices.flat)} devices")

    # data -> device (replicated over the mesh; the per-step ray batch is
    # what shards, inside train_steps)
    ds = make_dataset(cfg, "train")
    images_u8 = replicate(
        mesh, jnp.asarray(np.round(ds.images * 255).astype(np.uint8)))
    poses = replicate(mesh, jnp.asarray(ds.poses))
    intrinsics = replicate(mesh, jnp.asarray(ds.K))
    print(f"train data: {len(ds)} images {ds.H}x{ds.W}")

    params = init_nerf_params(k_init, opts)
    tx = make_optimizer(cfg)
    state = replicate(mesh, init_state(params, tx))
    # seed grid kept around as the rebuild starting point
    seed_grid = (
        replicate(mesh, occ.init_grid(
            k_grid, int(cfg.get("occupancy_grid_resolution", 128))))
        if opts.enable_ess
        else None
    )
    grid = seed_grid

    model_dir = cfg.trained_model_dir
    if not cfg.get("resume", True):
        wipe_dir(model_dir)
        wipe_dir(cfg.record_dir)
    begin_epoch = 0
    recorder = Recorder(cfg.record_dir)
    ckpt = load_checkpoint(model_dir, state)
    if ckpt is not None:
        state, begin_epoch, rec_state = ckpt
        state = replicate(mesh, state)
        begin_epoch += 1
        recorder.load_state_dict(rec_state)
        print(f"resumed from epoch {begin_epoch - 1}")
    elif cfg.get("pretrain"):
        # weights-only init from another experiment (net_utils.load_pretrain
        # :429-457 analog): cfg.pretrain is a checkpoint dir (or .npz path)
        import os

        from .checkpoint import load_params

        p = str(cfg.pretrain)
        pdir, tag = (os.path.dirname(p) or ".",
                     os.path.basename(p)[:-4]) if p.endswith(".npz") else (
            p, "latest")
        loaded = load_params(pdir, state.params, tag=tag)
        if loaded is None:
            raise FileNotFoundError(f"pretrain checkpoint not found: {p}")
        state = replicate(mesh, state._replace(params=loaded))
        print(f"initialized weights from pretrain: {p}")

    ep_iter = int(cfg.get("ep_iter", 500))
    log_interval = max(1, int(cfg.get("log_interval", 10)))
    # steps per compiled scan. The tunnel/relay kills any single device
    # execution that runs too long (observed: ~25 hashgrid steps = ~60 s
    # => "TPU worker crashed"), so slow-step configs (hashgrid gathers)
    # must set scan_chunk low enough to stay well under the limit.
    default_chunk = 8 if opts.xyz_encoder_type == "hashgrid" else 50
    chunk = min(ep_iter, int(cfg.get("scan_chunk",
                                     max(log_interval, default_chunk))))
    end_epoch = int(cfg.train.epoch) if max_epochs is None else min(
        int(cfg.train.epoch), begin_epoch + max_epochs
    )
    grid_rebuild_ep = int(cfg.get("grid_rebuild_ep", 10))

    # Whole-image loss semantics (the reference renders all H*W rays per
    # step with grad, trainers/nerf.py:20-76): every step renders one full
    # image, gradients accumulated exactly over static ray tiles. Orders of
    # magnitude more FLOPs/step than ray batching — parity experiments only.
    full_image = bool(cfg.get("train_full_image", False))
    if full_image:
        from .state import train_step_full_image

    for epoch in range(begin_epoch, end_epoch):
        recorder.epoch = epoch
        t_epoch = time.time()
        done = 0
        while done < ep_iter:
            if full_image:
                n = 1
                state, stats = train_step_full_image(
                    state, images_u8, poses, intrinsics, k_train, tx, opts,
                    ds.H, ds.W, tile=int(cfg.get("render_tile_rays", 8192)),
                    grid=grid,
                )
            else:
                n = min(chunk, ep_iter - done)
                state, stats = train_steps(
                    state, images_u8, poses, intrinsics, k_train, tx, opts,
                    n_rays, n, grid=grid, mesh=mesh,
                    precrop_iters=int(cfg.task_arg.get("precrop_iters", 0)),
                    precrop_frac=float(cfg.task_arg.get("precrop_frac", 0.5)),
                )
            done += n
            host_stats = {k2: float(v) for k2, v in stats.items()}
            check_finite_stats(host_stats, epoch, done)
            recorder.step = int(state.step)
            recorder.update(host_stats)
            recorder.record("train", stats=host_stats)
            lr = float(cfg.train.lr) * float(cfg.train.scheduler.gamma) ** (
                epoch / float(cfg.train.scheduler.decay_epochs)
            )
            # chunked mode logs every chunk (each is >= log_interval steps);
            # full-image mode logs every log_interval single-image steps
            if not full_image or done % log_interval == 0 or done >= ep_iter:
                print(
                    f"epoch {epoch} iter {done}/{ep_iter}  "
                    + "  ".join(
                        f"{k2}: {v:.4f}" for k2, v in host_stats.items())
                    + f"  lr: {lr:.2e}"
                )

        dt = time.time() - t_epoch
        rays_per_s = ep_iter * (ds.H * ds.W if full_image else n_rays) / dt
        print(f"epoch {epoch} done in {dt:.1f}s  ({rays_per_s:,.0f} train rays/s)")

        # ESS grid rebuild from the learned density (KiloNeRF method)
        if grid is not None and (epoch + 1) % grid_rebuild_ep == 0:
            density_fn = make_density_fn(state.params["coarse"], opts)
            grid = replicate(mesh, occ.populate_from_density(
                seed_grid, density_fn))
            rate = float(jnp.mean(grid.occupied.astype(jnp.float32)))
            print(f"occupancy grid rebuilt: {rate * 100:.2f}% occupied")

        # host-0 gating (the reference's rank-0 checkpoint/eval gating,
        # train.py:68-85); on a single host this is always true
        if is_main_process():
            if (epoch + 1) % int(cfg.get("save_latest_ep", 10)) == 0:
                save_checkpoint(model_dir, state, epoch, recorder.state_dict())
            if (epoch + 1) % int(cfg.get("save_ep", 40)) == 0:
                save_checkpoint(model_dir, state, epoch, recorder.state_dict())
            if (epoch + 1) % int(cfg.get("eval_ep", 40)) == 0:
                validate(cfg, state.params, opts, grid, recorder,
                         step=int(state.step))

    if is_main_process():
        save_checkpoint(model_dir, state, end_epoch - 1, recorder.state_dict())
    print(f"training complete: epoch {end_epoch - 1}")
    return state, grid


def validate(cfg, params, opts, grid, recorder=None, step=0, n_images: int = 2):
    """Quick validation: render a couple of val images, log PSNR."""
    from ..eval.metrics import psnr as psnr_fn

    try:
        val_cfg = cfg.clone()
        val_cfg.test_dataset.split = "val"
        ds = make_dataset(val_cfg, "test")
    except FileNotFoundError:
        # ADVICE r4: never skip silently — a misconfigured data_root would
        # otherwise train blind with no signal that validation never ran.
        print("WARNING: val split not found (check data_root); "
              "skipping validation", flush=True)
        return
    psnrs = []
    for i in range(min(n_images, len(ds))):
        out = render_image(
            params, jnp.asarray(ds.poses[i]), jnp.asarray(ds.K),
            jax.random.PRNGKey(i), ds.H, ds.W, opts, grid=grid,
        )
        pred = np.asarray(out.get("rgb_map", out["rgb_map_0"]))
        psnrs.append(psnr_fn(np.clip(pred, 0, 1), ds.images[i]))
    mean_psnr = float(np.mean(psnrs))
    print(f"val psnr: {mean_psnr:.2f}")
    if recorder is not None:
        recorder.record("val", step=step, stats={"psnr": mean_psnr})
    return mean_psnr
