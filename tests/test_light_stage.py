"""Light-stage multi-camera + latent dataset loaders (synthetic fixtures)."""
import os

import numpy as np
import pytest


def _make_rig(tmp_path, n_cams=3, n_frames=2, H=24, W=32):
    """Build a minimal ZJU-style capture: annots.npy + images + masks +
    per-frame vertices."""
    import imageio.v2 as imageio

    rng = np.random.RandomState(0)
    Ks, Rs, Ts, Ds, ims = [], [], [], [], []
    for c in range(n_cams):
        K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]])
        theta = 2 * np.pi * c / n_cams
        R = np.array([[np.cos(theta), 0, np.sin(theta)],
                      [0, 1, 0],
                      [-np.sin(theta), 0, np.cos(theta)]])
        T = np.array([[0.0], [0.0], [2000.0]])  # mm (loader divides by 1000)
        Ks.append(K); Rs.append(R); Ts.append(T); Ds.append(np.zeros(5))
    for f in range(n_frames):
        frame_ims = []
        for c in range(n_cams):
            rel = os.path.join("images", f"cam{c:02d}", f"{f:04d}.png")
            img_path = os.path.join(str(tmp_path), rel)
            os.makedirs(os.path.dirname(img_path), exist_ok=True)
            img = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
            imageio.imwrite(img_path, img)
            msk = np.zeros((H, W), np.uint8)
            msk[H // 4: 3 * H // 4, W // 4: 3 * W // 4] = 255
            msk_path = os.path.join(str(tmp_path), "mask", rel)
            os.makedirs(os.path.dirname(msk_path), exist_ok=True)
            imageio.imwrite(msk_path, msk)
            frame_ims.append(rel)
        ims.append({"ims": frame_ims})
        os.makedirs(os.path.join(str(tmp_path), "new_vertices"), exist_ok=True)
        verts = rng.rand(50, 3).astype(np.float32) - 0.5
        np.save(os.path.join(str(tmp_path), "new_vertices", f"{f}.npy"), verts)
    annots = {"cams": {"K": Ks, "R": Rs, "T": Ts, "D": Ds}, "ims": ims}
    np.save(os.path.join(str(tmp_path), "annots.npy"), annots,
            allow_pickle=True)


def test_light_stage_train_batches(tmp_path):
    from nerf_tpu.data.light_stage import LightStageDataset

    _make_rig(tmp_path)
    ds = LightStageDataset(str(tmp_path), split="train", n_rays=64)
    assert len(ds) == 3 * 2  # cams x frames
    b = ds[0]
    rays, rgb = b["rays"], b["rgb"]
    assert rays.shape[1] == 7 and rays.shape[0] <= 64
    assert rgb.shape == (rays.shape[0], 3)
    # ray dirs normalized; latent index column constant per item
    np.testing.assert_allclose(
        np.linalg.norm(rays[:, 3:6], axis=-1), 1.0, atol=1e-5)
    assert np.all(rays[:, 6] == rays[0, 6])
    # world bbox encloses all per-frame vertex bboxes
    assert b["wbounds"].shape == (6,)
    assert np.all(b["wbounds"][:3] <= -0.4) and np.all(b["wbounds"][3:] >= 0.4)
    # second frame carries latent index 1
    b2 = ds[3]  # frame 1, cam 0
    assert b2["meta"]["item"]["latent_index"] == 1
    assert np.all(b2["rays"][:, 6] == 1.0)


def test_light_stage_test_full_image_and_ranges(tmp_path):
    from nerf_tpu.data.light_stage import LightStageDataset

    _make_rig(tmp_path)
    ds = LightStageDataset(str(tmp_path), split="test",
                           cameras=(0, -1, 2), frames=(0, 1, 1))
    assert len(ds) == 2  # cams {0, 2} x frame 0
    b = ds[0]
    H, W = b["meta"]["H"], b["meta"]["W"]
    assert b["rays"].shape == (H * W, 7)
    assert b["rgb"].shape == (H * W, 3)
    # masked-out background pixels are black
    msum = (b["rgb"].sum(-1) > 0).mean()
    assert 0.1 < msum < 0.5  # only the center box is foreground


def test_light_stage_camera_ring_origins_differ(tmp_path):
    from nerf_tpu.data.light_stage import LightStageDataset

    _make_rig(tmp_path)
    ds = LightStageDataset(str(tmp_path), split="test")
    o0 = ds[0]["rays"][0, :3]
    o1 = ds[1]["rays"][0, :3]
    assert np.linalg.norm(o0 - o1) > 0.1  # different cameras -> origins


def test_latent_dataset(tmp_path):
    from nerf_tpu.data.latent import LatentDataset

    rng = np.random.RandomState(1)
    data = rng.rand(20, 200).astype(np.float32)
    np.save(os.path.join(str(tmp_path), "lego.npy"), data)
    ds = LatentDataset(str(tmp_path), "lego")
    assert len(ds) == 20
    x1, x2, y1, y2 = ds.split()
    assert x1.shape == (20, 1) and x2.shape == (20, 31)
    assert y1.shape == (20, 128) and y2.shape == (20, 40)
    np.testing.assert_array_equal(
        np.concatenate([x1, x2, y1, y2], -1), data)
    with pytest.raises(ValueError):
        np.save(os.path.join(str(tmp_path), "bad.npy"),
                np.zeros((4, 10), np.float32))
        LatentDataset(str(tmp_path), "bad")
