"""End-to-end train-loop test on CPU with a synthetic micro-scene."""
import json
import os

import numpy as np
import imageio.v2 as imageio
import pytest

from nerf_tpu.config import make_cfg


@pytest.fixture()
def micro_scene(tmp_path):
    """A 2-frame, 24x24 Blender-format scene."""
    scene = tmp_path / "data" / "tiny"
    (scene / "train").mkdir(parents=True)
    (scene / "val").mkdir(parents=True)
    rng = np.random.RandomState(0)
    frames = []
    for i in range(2):
        img = rng.randint(0, 255, (24, 24, 4), np.uint8)
        img[..., 3] = 255
        imageio.imwrite(str(scene / "train" / f"r_{i}.png"), img)
        imageio.imwrite(str(scene / "val" / f"r_{i}.png"), img)
        pose = np.eye(4)
        pose[2, 3] = 4.0
        frames.append({"file_path": f"./train/r_{i}",
                       "transform_matrix": pose.tolist()})
    meta = {"camera_angle_x": 0.7, "frames": frames}
    for split in ("train", "val"):
        m = dict(meta)
        if split == "val":
            m = {"camera_angle_x": 0.7, "frames": [
                {**f, "file_path": f["file_path"].replace("train", "val")}
                for f in frames]}
        with open(scene / f"transforms_{split}.json", "w") as f:
            json.dump(m, f)
    return str(tmp_path / "data")


def _cfg(micro_scene, tmp_path, **over):
    opts = [
        "train_dataset.data_root", micro_scene,
        "test_dataset.data_root", micro_scene,
        "scene", "tiny",
        "train_dataset.H", "24", "train_dataset.W", "24",
        "test_dataset.H", "24", "test_dataset.W", "24",
        "task_arg.N_rays", "32", "task_arg.N_samples", "4",
        "task_arg.N_importance", "4",
        "network.nerf.W", "32", "network.nerf.D", "2",
        "network.nerf.skips", "[0]", "network.dtype", "float32",
        "ep_iter", "4", "train.epoch", "3", "log_interval", "2",
        "save_latest_ep", "1", "eval_ep", "2", "grid_rebuild_ep", "2",
        "occupancy_grid_resolution", "16",
        "use_pallas_kernels", "False", "render_tile_rays", "64",
        "workspace", str(tmp_path / "ws"),
    ]
    for k, v in over.items():
        opts += [k, str(v)]
    return make_cfg("configs/nerf/lego.yaml", opts)


def test_train_resume_and_artifacts(micro_scene, tmp_path):
    from nerf_tpu.train.loop import train

    cfg = _cfg(micro_scene, tmp_path)
    state, grid = train(cfg)
    assert int(state.step) == 12  # 3 epochs x 4 iters
    ckpt_dir = cfg.trained_model_dir
    assert os.path.exists(os.path.join(ckpt_dir, "latest.npz"))

    # resume: two more epochs continue from step 12
    cfg2 = _cfg(micro_scene, tmp_path, **{"train.epoch": 5})
    state2, _ = train(cfg2)
    assert int(state2.step) == 20


def test_check_finite_stats_guard():
    import pytest

    from nerf_tpu.train.loop import check_finite_stats

    check_finite_stats({"loss": 0.5, "psnr": 30.0})
    with pytest.raises(FloatingPointError, match="loss"):
        check_finite_stats({"loss": float("nan")}, epoch=3, iteration=250)
    with pytest.raises(FloatingPointError):
        check_finite_stats({"loss": float("inf")})


def test_train_full_image_mode(micro_scene, tmp_path):
    """cfg.train_full_image routes the loop through whole-image steps."""
    from nerf_tpu.train.loop import train

    cfg = _cfg(micro_scene, tmp_path, **{
        "train_full_image": "True", "train.epoch": 1, "ep_iter": 2,
        "workspace": str(tmp_path / "ws_full"),
    })
    state, _ = train(cfg)
    assert int(state.step) == 2


def test_pretrain_initialization(micro_scene, tmp_path):
    """cfg.pretrain seeds a fresh run with another experiment's weights."""
    import numpy as np

    from nerf_tpu.train.loop import train

    cfg1 = _cfg(micro_scene, tmp_path, **{"train.epoch": 1, "ep_iter": 2})
    state1, _ = train(cfg1)

    cfg2 = _cfg(micro_scene, tmp_path, **{
        "train.epoch": 1, "ep_iter": 2,
        "workspace": str(tmp_path / "ws2"),
        "pretrain": cfg1.trained_model_dir,
    })
    state2, _ = train(cfg2)
    # step counter restarts (weights-only), run completes
    assert int(state2.step) == 2

    import pytest

    cfg3 = _cfg(micro_scene, tmp_path, **{
        "workspace": str(tmp_path / "ws3"),
        "pretrain": str(tmp_path / "nope"),
    })
    with pytest.raises(FileNotFoundError):
        train(cfg3)


def test_precrop_warmup_sampling():
    """While step < precrop_iters pixels come from the central crop only;
    after the warmup the full image is sampled (reference lego.yaml:26-27
    declares precrop_iters/frac but never wires them — we do)."""
    import jax
    import jax.numpy as jnp

    from nerf_tpu.train.state import sample_ray_batch
    from nerf_tpu.render.rays import rays_for_pixels

    rng = np.random.RandomState(0)
    H = W = 32
    images = jnp.asarray(rng.randint(0, 256, (1, H, W, 3), np.uint8))
    poses = jnp.broadcast_to(jnp.eye(4), (1, 4, 4))
    K = jnp.asarray([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]],
                    jnp.float32)

    def pixel_coords(step):
        # recover the sampled pixel from the ray direction: the sampler uses
        # rays_for_pixels(px, py, K, pose); with identity pose the direction
        # encodes (px-cx)/fx, -(py-cy)/fy before normalization
        ro, rd, tgt = sample_ray_batch(
            jax.random.PRNGKey(3), images, poses, K, 256,
            step=jnp.asarray(step), precrop_iters=100, precrop_frac=0.5)
        rd = np.asarray(rd)
        px = rd[:, 0] / (-rd[:, 2]) * 40.0 + W / 2
        py = -rd[:, 1] / (-rd[:, 2]) * 40.0 + H / 2
        return px, py

    px, py = pixel_coords(0)  # warmup: central 50% crop only
    assert px.min() >= W / 2 - 8 - 0.5 and px.max() <= W / 2 + 8 + 0.5
    assert py.min() >= H / 2 - 8 - 0.5 and py.max() <= H / 2 + 8 + 0.5
    px, py = pixel_coords(100)  # past warmup: full image
    assert px.min() < W / 2 - 8 or py.min() < H / 2 - 8
    assert px.max() > W / 2 + 8 or py.max() > H / 2 + 8


def test_checkpoint_roundtrip_bfloat16_leaves(tmp_path):
    """bf16 leaves (hash tables) survive npz only as raw |V2 bytes; the
    restore must reinterpret the bits (round-4 bug: hashgrid checkpoints
    failed to load with 'No cast function available')."""
    import jax.numpy as jnp

    from nerf_tpu.train.checkpoint import (
        load_checkpoint, load_params, save_checkpoint)

    state = {
        "w": np.arange(6, dtype=np.float32).reshape(2, 3),
        "table": jnp.asarray([[1.5, -2.0], [0.25, 4.0]], jnp.bfloat16),
        "step": np.int32(7),
    }
    d = str(tmp_path / "ck")
    save_checkpoint(d, state, epoch=3)
    loaded, epoch, _ = load_checkpoint(d, state)
    assert epoch == 3
    assert loaded["table"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(loaded["table"], np.float32),
        np.asarray(state["table"], np.float32))
    p = load_params(d, state)
    assert p["table"].dtype == jnp.bfloat16
