#!/usr/bin/env python
"""Standalone images -> mp4 CLI.

Parity surface: reference ``create_video_from_images.py`` — builds videos
from already-rendered result images: pred-only, gt-only, or side-by-side
comparison.

Usage:
    python create_video_from_images.py --image_dir <dir> [--mode pred|gt|comparison]
        [--output out.mp4] [--fps 24] [--pattern "view*_pred.png"]
"""
from __future__ import annotations

import argparse
import glob
import os
import re
import sys

import numpy as np


def load_frames(image_dir: str, pattern: str) -> np.ndarray:
    import imageio.v2 as imageio

    files = sorted(
        glob.glob(os.path.join(image_dir, pattern)),
        key=lambda p: [int(t) if t.isdigit() else t
                       for t in re.split(r"(\d+)", os.path.basename(p))],
    )
    if not files:
        raise FileNotFoundError(f"no images matching {pattern} in {image_dir}")
    frames = [np.asarray(imageio.imread(f))[..., :3] for f in files]
    return np.stack(frames)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--image_dir", required=True)
    parser.add_argument("--mode", default="pred",
                        choices=["pred", "gt", "comparison"])
    parser.add_argument("--output", default=None)
    parser.add_argument("--fps", type=int, default=24)
    parser.add_argument("--pattern", default=None)
    args = parser.parse_args(argv)

    from nerf_tpu.eval.video import write_video

    if args.mode == "comparison":
        pred = load_frames(args.image_dir, args.pattern or "view*_pred.png")
        gt = load_frames(args.image_dir, "view*_gt.png")
        n = min(len(pred), len(gt))
        frames = np.concatenate([pred[:n], gt[:n]], axis=2)
    else:
        pattern = args.pattern or f"view*_{args.mode}.png"
        frames = load_frames(args.image_dir, pattern)

    out = args.output or os.path.join(args.image_dir, f"{args.mode}.mp4")
    write_video(frames, out, fps=args.fps)
    print(f"wrote {out} ({len(frames)} frames @ {args.fps} fps)")


if __name__ == "__main__":
    main(sys.argv[1:])
