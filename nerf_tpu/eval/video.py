"""Novel-view sequence rendering and mp4 writing.

Parity: reference ``render_novel_view_sequence`` / ``create_video_from_images``
(volume_renderer.py:511-707) — renders a spiral or original camera path,
writes ``view%04d_{rgb,disp}.png`` frames and mp4s (imageio, quality 8,
macro_block_size 16), with a black-frame fallback per failed render.
"""
from __future__ import annotations

import os
from typing import Dict

import numpy as np


def write_video(frames: np.ndarray, path: str, fps: int = 24):
    """frames: [N, H, W, 3] float [0,1] or uint8.

    Prefers imageio/ffmpeg (reference parity: quality 8, macro_block 16,
    volume_renderer.py:618-707); falls back to OpenCV's mp4v writer when no
    ffmpeg backend is installed."""
    if frames.dtype != np.uint8:
        frames = (np.clip(frames, 0, 1) * 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        import imageio.v2 as imageio

        imageio.mimwrite(path, frames, fps=fps, quality=8, macro_block_size=16)
    except Exception:
        import cv2

        h, w = frames.shape[1:3]
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
        if not vw.isOpened():
            raise RuntimeError(f"no video backend available for {path}")
        for frame in frames:
            vw.write(frame[..., ::-1])  # RGB -> BGR
        vw.release()


def colorize_disparity(disp: np.ndarray) -> np.ndarray:
    """Normalize a disparity map to [0,1] grayscale rgb."""
    d = np.asarray(disp, np.float32)
    dmax = d.max() if d.max() > 0 else 1.0
    d = np.clip(d / dmax, 0, 1)
    return np.stack([d, d, d], axis=-1)


def render_novel_view_sequence(
    render_fn,
    poses: np.ndarray,
    H: int,
    W: int,
    result_dir: str,
    fps: int = 24,
    save_frames: bool = True,
    tag: str = "spiral",
) -> Dict[str, str]:
    """Render each pose with ``render_fn(pose) -> {rgb_map, disp_map}``,
    dump frames and write rgb + disp videos. Returns output paths."""
    import imageio.v2 as imageio

    frame_dir = os.path.join(result_dir, "frames")
    video_dir = os.path.join(result_dir, "videos")
    os.makedirs(video_dir, exist_ok=True)
    if save_frames:
        os.makedirs(frame_dir, exist_ok=True)

    rgbs, disps = [], []
    for i, pose in enumerate(poses):
        try:
            out = render_fn(np.asarray(pose))
            rgb = np.clip(np.asarray(out["rgb_map"]), 0, 1)
            disp = np.asarray(out["disp_map"])
        except Exception as e:  # black-frame fallback (reference :501-507)
            print(f"Error rendering frame {i}: {e}")
            rgb = np.zeros((H, W, 3), np.float32)
            disp = np.zeros((H, W), np.float32)
        rgbs.append(rgb)
        disps.append(disp)
        if save_frames:
            imageio.imwrite(
                os.path.join(frame_dir, f"view{i:04d}_rgb.png"),
                (rgb * 255).astype(np.uint8),
            )
    rgbs = np.stack(rgbs)
    disps = np.stack(disps)

    rgb_path = os.path.join(video_dir, f"{tag}_rgb.mp4")
    disp_path = os.path.join(video_dir, f"{tag}_disp.mp4")
    write_video(rgbs, rgb_path, fps=fps)
    write_video(np.stack([colorize_disparity(d) for d in disps]), disp_path, fps=fps)
    print(f"Videos written: {rgb_path}, {disp_path}")
    return {"rgb": rgb_path, "disp": disp_path}


def create_comparison_video(
    pred_frames: np.ndarray, gt_frames: np.ndarray, path: str, fps: int = 24
):
    """Side-by-side pred|gt comparison video (reference :750-828)."""
    frames = np.concatenate([pred_frames, gt_frames], axis=2)
    write_video(frames, path, fps=fps)
