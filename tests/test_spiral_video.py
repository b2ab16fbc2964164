"""Spiral pose generation + video writing."""
import os

import numpy as np

from nerf_tpu.eval.video import render_novel_view_sequence, write_video
from nerf_tpu.render.spiral import generate_spiral_poses


def _dataset_poses(n=10, radius=4.0):
    poses = []
    for i in range(n):
        th = 2 * np.pi * i / n
        pos = radius * np.array([np.cos(th), np.sin(th), 0.3])
        fwd = pos / np.linalg.norm(pos)  # +Z points away from origin
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        m = np.eye(4)
        m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = right, up2, fwd, pos
        poses.append(m)
    return np.stack(poses).astype(np.float32)


def test_spiral_poses_orbit():
    poses = _dataset_poses()
    sp = generate_spiral_poses(poses, n_frames=24)
    assert sp.shape == (24, 4, 4)
    centers = sp[:, :3, 3]
    r = np.linalg.norm(centers - centers.mean(0), axis=1)
    # orbit at roughly the mean dataset radius
    assert abs(r.mean() - 4.0) < 1.0
    # rotation matrices orthonormal
    R = sp[:, :3, :3]
    err = np.abs(R @ np.swapaxes(R, 1, 2) - np.eye(3)).max()
    assert err < 1e-5
    # NeRF convention: the camera looks along -Z, i.e. the view direction
    # (-Z column) must point from the camera toward the orbit center
    view_dirs = -sp[:, :3, 2]
    to_center = centers.mean(0) - centers
    to_center /= np.linalg.norm(to_center, axis=1, keepdims=True)
    cos = np.sum(view_dirs * to_center, axis=1)
    assert (cos > 0.95).all(), cos.min()


def test_write_video_and_sequence(tmp_path):
    frames = (np.random.RandomState(0).rand(6, 32, 48, 3)).astype(np.float32)
    path = str(tmp_path / "v.mp4")
    write_video(frames, path, fps=4)
    assert os.path.getsize(path) > 500

    calls = []

    def render_fn(pose):
        calls.append(1)
        return {"rgb_map": np.full((16, 16, 3), 0.5),
                "disp_map": np.ones((16, 16))}

    out = render_novel_view_sequence(
        render_fn, np.stack([np.eye(4)] * 3), 16, 16, str(tmp_path),
        fps=4, save_frames=True)
    assert len(calls) == 3
    assert os.path.exists(out["rgb"]) and os.path.exists(out["disp"])
    assert os.path.exists(tmp_path / "frames" / "view0000_rgb.png")


def test_black_frame_fallback(tmp_path):
    def render_fn(pose):
        raise RuntimeError("boom")

    out = render_novel_view_sequence(
        render_fn, np.stack([np.eye(4)] * 2), 8, 8, str(tmp_path),
        fps=2, save_frames=False)
    assert os.path.exists(out["rgb"])  # black frames written, no crash
