"""img_fit dataset: fit a single view's RGB as a function of uv.

Parity: reference ``src/datasets/img_fit/synthetic.py`` — uv grid in [0,1]^2,
random ``N_pixels`` pixel batch for train, the full image for test. (The
reference file has broken ``lib.*`` imports; this is the intended behavior,
SURVEY.md §7.3.)
"""
from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np


class ImgFitDataset:
    def __init__(
        self,
        data_root: str = "data/nerf_synthetic",
        scene: str = "lego",
        split: str = "train",
        view: int = 0,
        input_ratio: float = 1.0,
        n_pixels: int = 8192,
        white_bkgd: bool = True,
    ):
        from .blender import _load_image, _resize

        self.split = split
        self.n_pixels = n_pixels
        scene_path = os.path.join(data_root, scene)
        with open(os.path.join(scene_path, "transforms_train.json")) as f:
            meta = json.load(f)
        frame = meta["frames"][view]
        img = _load_image(os.path.join(scene_path, frame["file_path"] + ".png"))
        if img.shape[-1] == 4:
            rgb, alpha = img[..., :3], img[..., -1:]
            img = rgb * alpha + (1.0 - alpha) if white_bkgd else rgb
        if input_ratio != 1.0:
            H = int(img.shape[0] * input_ratio)
            W = int(img.shape[1] * input_ratio)
            img = _resize(img, H, W)
        self.image = img.astype(np.float32)  # [H, W, 3]
        H, W = img.shape[:2]
        self.H, self.W = H, W
        u, v = np.meshgrid(
            np.linspace(0, 1, W, dtype=np.float32),
            np.linspace(0, 1, H, dtype=np.float32),
        )
        self.uv = np.stack([u, v], -1).reshape(-1, 2)  # [H*W, 2]
        self.rgb = self.image.reshape(-1, 3)

    def sample_batch(self, rng: np.random.RandomState) -> Dict[str, np.ndarray]:
        idx = rng.randint(0, self.uv.shape[0], self.n_pixels)
        return {"uv": self.uv[idx], "rgb": self.rgb[idx]}

    def full(self) -> Dict[str, np.ndarray]:
        return {"uv": self.uv, "rgb": self.rgb, "H": self.H, "W": self.W}
