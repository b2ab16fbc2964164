"""Heuristic background conversion of black-background GT images to white.

Parity surface: reference ``src/evaluators/nerf.py:109-363`` —
``conservative_background_conversion`` (corner/edge flood-fill style
connected-component analysis) and ``smart_background_conversion`` (edge +
local-variance + saturation masks), selected by ``cfg.background_strategy``
("conservative" | "smart" | "none"; the lego config ships "none").
"""
from __future__ import annotations

import numpy as np


def _flood_background_mask(dark: np.ndarray) -> np.ndarray:
    """Connected component of dark pixels reachable from the image border."""
    import cv2

    mask = dark.astype(np.uint8)
    h, w = mask.shape
    ff = mask.copy()
    ff_mask = np.zeros((h + 2, w + 2), np.uint8)
    # flood from every border pixel that is dark
    seeds = (
        [(0, x) for x in range(w)] + [(h - 1, x) for x in range(w)]
        + [(y, 0) for y in range(h)] + [(y, w - 1) for y in range(h)]
    )
    out = np.zeros_like(mask)
    visited = np.zeros_like(mask, bool)
    for y, x in seeds:
        if mask[y, x] and not visited[y, x]:
            ff2 = np.zeros((h + 2, w + 2), np.uint8)
            cv2.floodFill(ff, ff2, (x, y), 2)
            comp = ff2[1:-1, 1:-1] > 0
            out[comp] = 1
            visited |= comp
    return out.astype(bool)


def conservative_background_conversion(
    img: np.ndarray, dark_threshold: float = 0.1
) -> np.ndarray:
    """Convert border-connected dark regions to white (reference :109-216).

    img: [H, W, 3] float [0,1]. Only pixels in dark connected components
    touching the border are converted — interior dark object parts survive.
    """
    img = np.asarray(img, np.float32)
    dark = img.max(axis=-1) < dark_threshold
    if not dark.any():
        return img
    bg = _flood_background_mask(dark)
    out = img.copy()
    out[bg] = 1.0
    return out


def smart_background_conversion(
    img: np.ndarray,
    dark_threshold: float = 0.12,
    var_threshold: float = 1e-4,
    sat_threshold: float = 0.15,
) -> np.ndarray:
    """Edge/variance/saturation-based conversion (reference :218-363):
    a pixel is background if it is dark AND locally flat AND unsaturated AND
    border-connected."""
    import cv2

    img = np.asarray(img, np.float32)
    gray = img.mean(axis=-1)
    dark = gray < dark_threshold
    # local variance via box filters
    mean = cv2.blur(gray, (5, 5))
    mean_sq = cv2.blur(gray * gray, (5, 5))
    var = np.maximum(mean_sq - mean * mean, 0.0)
    flat = var < var_threshold
    # saturation: (max-min)/max
    mx = img.max(axis=-1)
    mn = img.min(axis=-1)
    sat = np.where(mx > 1e-6, (mx - mn) / np.maximum(mx, 1e-6), 0.0)
    unsat = sat < sat_threshold
    candidate = dark & flat & unsat
    if not candidate.any():
        return img
    bg = _flood_background_mask(candidate)
    out = img.copy()
    out[bg] = 1.0
    return out


def convert_background(img: np.ndarray, strategy: str = "none") -> np.ndarray:
    if strategy == "conservative":
        return conservative_background_conversion(img)
    if strategy == "smart":
        return smart_background_conversion(img)
    return np.asarray(img, np.float32)
