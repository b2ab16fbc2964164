"""Image quality metrics: MSE, PSNR, SSIM.

SSIM is a self-contained implementation matching skimage's
``structural_similarity`` defaults as used by the reference evaluator
(``src/evaluators/nerf.py:84-92``): win_size=7 uniform filter,
K1=0.01, K2=0.03, data_range=1.0, channel-wise mean (channel_axis=2),
sample covariance normalization (N/(N-1)).
"""
from __future__ import annotations

import numpy as np


def mse(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 1.0) -> float:
    m = mse(a, b)
    if m == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range**2 / m))


def _uniform_filter(x: np.ndarray, size: int) -> np.ndarray:
    """'same'-size uniform filter with reflect-free interior crop handled by
    caller; matches scipy.ndimage.uniform_filter's output on the valid
    interior, which is all SSIM uses after edge cropping."""
    from scipy.ndimage import uniform_filter

    return uniform_filter(x, size=size, mode="reflect")


def ssim_single(
    a: np.ndarray, b: np.ndarray, win_size: int = 7, data_range: float = 1.0
) -> float:
    """SSIM for one 2D channel (skimage-compatible, gaussian_weights=False)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    NP = win_size**2
    cov_norm = NP / (NP - 1)

    ux = _uniform_filter(a, win_size)
    uy = _uniform_filter(b, win_size)
    uxx = _uniform_filter(a * a, win_size)
    uyy = _uniform_filter(b * b, win_size)
    uxy = _uniform_filter(a * b, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    A1 = 2 * ux * uy + C1
    A2 = 2 * vxy + C2
    B1 = ux**2 + uy**2 + C1
    B2 = vx + vy + C2
    S = (A1 * A2) / (B1 * B2)

    pad = (win_size - 1) // 2
    return float(S[pad:-pad, pad:-pad].mean())


def ssim(
    a: np.ndarray, b: np.ndarray, win_size: int = 7, data_range: float = 1.0
) -> float:
    """Multichannel SSIM: mean over the last axis's channels."""
    a = np.asarray(a)
    b = np.asarray(b)
    if a.ndim == 2:
        return ssim_single(a, b, win_size, data_range)
    return float(
        np.mean([ssim_single(a[..., c], b[..., c], win_size, data_range)
                 for c in range(a.shape[-1])])
    )
