"""Native C++ image loader vs the Python (imageio/cv2) path."""
import os

import numpy as np
import pytest

from nerf_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def _write_png(path, arr):
    import imageio.v2 as imageio

    imageio.imwrite(path, arr)


def test_rgba_white_composite(tmp_path, lib):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (32, 40, 4), np.uint8)
    p = str(tmp_path / "a.png")
    _write_png(p, img)
    out = native.load_images([p], white_bkgd=True)
    assert out.shape == (1, 32, 40, 3)
    f = img.astype(np.float32) / 255.0
    want = f[..., :3] * f[..., 3:] + (1 - f[..., 3:])
    np.testing.assert_allclose(out[0], want, atol=1e-6)


def test_rgb_no_alpha(tmp_path, lib):
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (16, 16, 3), np.uint8)
    p = str(tmp_path / "b.png")
    _write_png(p, img)
    out = native.load_images([p], white_bkgd=True)
    np.testing.assert_allclose(out[0], img.astype(np.float32) / 255.0, atol=1e-6)


def test_resize_matches_torch_bilinear(tmp_path, lib):
    """Resize parity with the reference's F.interpolate(align_corners=False)."""
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (64, 64, 3), np.uint8)
    p = str(tmp_path / "c.png")
    _write_png(p, img)
    out = native.load_images([p], H=32, W=32, white_bkgd=True)
    f = torch.from_numpy(img.astype(np.float32) / 255.0)
    want = F.interpolate(
        f.permute(2, 0, 1)[None], size=(32, 32), mode="bilinear",
        align_corners=False,
    )[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(out[0], want, atol=1e-5)


def test_many_images_threaded(tmp_path, lib):
    rng = np.random.RandomState(3)
    paths = []
    truth = []
    for i in range(16):
        img = rng.randint(0, 255, (24, 24, 4), np.uint8)
        p = str(tmp_path / f"t{i}.png")
        _write_png(p, img)
        paths.append(p)
        f = img.astype(np.float32) / 255.0
        truth.append(f[..., :3] * f[..., 3:] + (1 - f[..., 3:]))
    out = native.load_images(paths, white_bkgd=True, n_threads=8)
    np.testing.assert_allclose(out, np.stack(truth), atol=1e-6)


def test_missing_file(tmp_path, lib):
    assert native.load_images([str(tmp_path / "missing.png")]) is None


def test_blender_dataset_uses_native(lego_root, lib, monkeypatch):
    from nerf_tpu.data.blender import BlenderDataset

    monkeypatch.setenv("NERF_TPU_NATIVE_LOADER", "1")
    ds = BlenderDataset(lego_root, split="val", scene="lego",
                        cams=[0, 4, 1], H=800, W=800)
    assert ds.images.shape == (4, 800, 800, 3)
    assert ds.images.dtype == np.float32
    assert 0.0 <= ds.images.min() and ds.images.max() <= 1.0
    # white-composited background corners must be white
    assert ds.images[0, 0, 0].min() > 0.95
