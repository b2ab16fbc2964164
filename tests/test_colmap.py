"""COLMAP I/O round-trip tests (mirrors the toolbox's own test strategy)."""
import subprocess
import sys
import json
import numpy as np

from nerf_tpu.utils.colmap import (
    Camera, Image, Point3D, image_c2w, qvec2rotmat, rotmat2qvec,
    read_cameras_bin, read_cameras_txt, read_images_bin, read_images_txt,
    read_points3d_bin, write_cameras_bin, write_cameras_txt,
    write_images_bin, write_images_txt, write_points3d_bin,
)


def _model():
    rng = np.random.RandomState(0)
    cams = {1: Camera(1, "PINHOLE", 800, 600,
                      np.array([700.0, 710.0, 400.0, 300.0]))}
    imgs = {}
    for i in range(1, 4):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        q *= np.sign(q[0]) if q[0] != 0 else 1
        imgs[i] = Image(i, q, rng.randn(3), 1, f"img_{i}.png",
                        rng.rand(5, 2) * 100,
                        rng.randint(-1, 10, 5).astype(np.int64))
    pts = {7: Point3D(7, rng.randn(3), np.array([10, 20, 30]), 0.5,
                      np.array([1, 2]), np.array([0, 1]))}
    return cams, imgs, pts


def test_quaternion_roundtrip():
    rng = np.random.RandomState(1)
    for _ in range(10):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        q *= np.sign(q[0]) if q[0] != 0 else 1
        R = qvec2rotmat(q)
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-10)
        np.testing.assert_allclose(rotmat2qvec(R), q, atol=1e-8)


def test_bin_roundtrip(tmp_path):
    cams, imgs, pts = _model()
    write_cameras_bin(str(tmp_path / "cameras.bin"), cams)
    write_images_bin(str(tmp_path / "images.bin"), imgs)
    write_points3d_bin(str(tmp_path / "points3D.bin"), pts)
    cams2 = read_cameras_bin(str(tmp_path / "cameras.bin"))
    imgs2 = read_images_bin(str(tmp_path / "images.bin"))
    pts2 = read_points3d_bin(str(tmp_path / "points3D.bin"))
    np.testing.assert_allclose(cams2[1].params, cams[1].params)
    for i in imgs:
        np.testing.assert_allclose(imgs2[i].qvec, imgs[i].qvec)
        np.testing.assert_allclose(imgs2[i].xys, imgs[i].xys)
        assert imgs2[i].name == imgs[i].name
    np.testing.assert_allclose(pts2[7].xyz, pts[7].xyz)


def test_txt_roundtrip(tmp_path):
    cams, imgs, _ = _model()
    write_cameras_txt(str(tmp_path / "cameras.txt"), cams)
    write_images_txt(str(tmp_path / "images.txt"), imgs)
    cams2 = read_cameras_txt(str(tmp_path / "cameras.txt"))
    imgs2 = read_images_txt(str(tmp_path / "images.txt"))
    np.testing.assert_allclose(cams2[1].params, cams[1].params)
    for i in imgs:
        np.testing.assert_allclose(imgs2[i].qvec, imgs[i].qvec, atol=1e-12)


def test_c2w_inverts_world2cam():
    _, imgs, _ = _model()
    im = imgs[1]
    c2w = image_c2w(im)
    R = qvec2rotmat(im.qvec)
    # world->cam of the camera center must be the origin
    center = c2w[:3, 3]
    np.testing.assert_allclose(R @ center + im.tvec, 0, atol=1e-12)


def test_colmap2nerf_cli(tmp_path):
    cams, imgs, pts = _model()
    write_cameras_txt(str(tmp_path / "cameras.txt"), cams)
    write_images_txt(str(tmp_path / "images.txt"), imgs)
    out = tmp_path / "transforms.json"
    subprocess.run(
        [sys.executable, "scripts/colmap2nerf.py", "--model_dir",
         str(tmp_path), "--out", str(out)],
        check=True, capture_output=True,
    )
    data = json.loads(out.read_text())
    assert len(data["frames"]) == 3
    assert "camera_angle_x" in data
    m = np.asarray(data["frames"][0]["transform_matrix"])
    assert m.shape == (4, 4)
