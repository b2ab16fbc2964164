#!/usr/bin/env python
"""COLMAP sparse model -> NeRF transforms.json converter.

Parity surface: reference ``scripts/colmap2nerf.py`` (instant-ngp's
converter): reads a COLMAP model, recenters/rescales the scene, flips the
coordinate convention to NeRF's (+X right, +Y up, +Z back), and writes
``transforms.json`` with camera_angle_x and per-frame transform matrices.

Usage:
    python scripts/colmap2nerf.py --model_dir sparse/0 --images images \
        --out transforms.json [--aabb_scale 4]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nerf_tpu.utils.colmap import image_c2w, read_model  # noqa: E402


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_dir", required=True)
    parser.add_argument("--images", default="images")
    parser.add_argument("--out", default="transforms.json")
    parser.add_argument("--aabb_scale", type=int, default=4)
    parser.add_argument("--keep_colmap_coords", action="store_true")
    args = parser.parse_args(argv)

    cams, imgs, _ = read_model(args.model_dir)
    cam = next(iter(cams.values()))
    if cam.model in ("SIMPLE_PINHOLE", "SIMPLE_RADIAL", "RADIAL",
                     "SIMPLE_RADIAL_FISHEYE", "RADIAL_FISHEYE"):
        fx = fy = cam.params[0]
        cx, cy = cam.params[1], cam.params[2]
    else:  # PINHOLE / OPENCV family: fx fy cx cy ...
        fx, fy, cx, cy = cam.params[:4]

    camera_angle_x = 2 * np.arctan(cam.width / (2 * fx))
    camera_angle_y = 2 * np.arctan(cam.height / (2 * fy))

    frames = []
    c2ws = []
    for im in sorted(imgs.values(), key=lambda im: im.name):
        c2w = image_c2w(im)
        if not args.keep_colmap_coords:
            # COLMAP: +Z forward, +Y down -> NeRF/OpenGL: -Z forward, +Y up
            c2w[0:3, 1] *= -1
            c2w[0:3, 2] *= -1
        c2ws.append(c2w)
        frames.append({
            "file_path": os.path.join(args.images,
                                      os.path.splitext(im.name)[0]),
            "transform_matrix": c2w,
        })

    if not args.keep_colmap_coords and c2ws:
        # recenter on the mean camera position, rescale to ~unit radius * 4
        centers = np.stack([m[:3, 3] for m in c2ws])
        center = centers.mean(axis=0)
        scale = 4.0 / max(np.linalg.norm(centers - center, axis=1).mean(), 1e-8)
        for fr in frames:
            m = fr["transform_matrix"]
            m[:3, 3] = (m[:3, 3] - center) * scale

    out = {
        "camera_angle_x": float(camera_angle_x),
        "camera_angle_y": float(camera_angle_y),
        "fl_x": float(fx), "fl_y": float(fy),
        "cx": float(cx), "cy": float(cy),
        "w": int(cam.width), "h": int(cam.height),
        "aabb_scale": args.aabb_scale,
        "frames": [
            {"file_path": fr["file_path"],
             "transform_matrix": fr["transform_matrix"].tolist()}
            for fr in frames
        ],
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}: {len(frames)} frames, "
          f"camera_angle_x={camera_angle_x:.4f}")


if __name__ == "__main__":
    main()
