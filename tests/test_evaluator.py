"""Evaluator + metrics tests (MSE/PSNR/SSIM oracle, report artifacts)."""
import json
import os

import numpy as np

from nerf_tpu.eval.evaluator import Evaluator
from nerf_tpu.eval.metrics import mse, psnr, ssim, ssim_single


def _ssim_naive(a, b, win=7, data_range=1.0):
    """Independent sliding-window oracle (crop='valid' mean, skimage
    convention: uniform window, sample covariance, edge crop win//2)."""
    K1, K2 = 0.01, 0.03
    C1, C2 = (K1 * data_range) ** 2, (K2 * data_range) ** 2
    NP = win * win
    H, W = a.shape
    vals = []
    for i in range(H - win + 1):
        for j in range(W - win + 1):
            x = a[i:i + win, j:j + win].ravel()
            y = b[i:i + win, j:j + win].ravel()
            ux, uy = x.mean(), y.mean()
            vx = ((x - ux) ** 2).sum() / (NP - 1)
            vy = ((y - uy) ** 2).sum() / (NP - 1)
            cxy = ((x - ux) * (y - uy)).sum() / (NP - 1)
            vals.append(((2 * ux * uy + C1) * (2 * cxy + C2))
                        / ((ux**2 + uy**2 + C1) * (vx + vy + C2)))
    return float(np.mean(vals))


def test_basic_metrics():
    a = np.zeros((8, 8, 3), np.float32)
    b = np.full((8, 8, 3), 0.1, np.float32)
    assert abs(mse(a, b) - 0.01) < 1e-9
    assert abs(psnr(a, b) - 20.0) < 1e-6
    assert psnr(a, a) == float("inf")


def test_ssim_against_naive_oracle():
    rng = np.random.RandomState(0)
    a = rng.rand(14, 14).astype(np.float64)
    b = np.clip(a + rng.randn(14, 14) * 0.1, 0, 1)
    ours = ssim_single(a, b, win_size=7)
    oracle = _ssim_naive(a, b, win=7)
    assert abs(ours - oracle) < 1e-7

    assert abs(ssim_single(a, a) - 1.0) < 1e-12
    # symmetry and monotone degradation
    assert abs(ssim_single(a, b) - ssim_single(b, a)) < 1e-12
    worse = np.clip(a + rng.randn(14, 14) * 0.4, 0, 1)
    assert ssim_single(a, worse) < ssim_single(a, b)

    # channel-mean 3D entry point
    a3 = np.stack([a] * 3, axis=-1)
    b3 = np.stack([b] * 3, axis=-1)
    assert abs(ssim(a3, b3) - ours) < 1e-7


def test_evaluator_reports_and_autonormalize(tmp_path, capsys):
    rng = np.random.RandomState(1)
    gt = rng.rand(16, 16, 3).astype(np.float32)
    pred = np.clip(gt + 0.05, 0, 1)

    ev = Evaluator(str(tmp_path), save_images=True)
    r1 = ev.evaluate(pred, gt, 0)
    # [0,255]-scaled inputs are auto-normalized, not clipped to garbage
    r2 = ev.evaluate(pred * 255.0, gt * 255.0, 1)
    assert "auto-normalizing" in capsys.readouterr().out
    assert abs(r1["psnr"] - r2["psnr"]) < 1e-4

    out = ev.summarize()
    assert abs(out["avg_psnr"] - np.mean([r1["psnr"], r2["psnr"]])) < 1e-6

    mdir = tmp_path / "metrics"
    results = json.loads((mdir / "evaluation_results.json").read_text())
    assert results["summary"]["num_images"] == 2
    assert len(results["per_image"]) == 2
    assert "Average PSNR" in (mdir / "evaluation_summary.txt").read_text()
    assert os.path.exists(tmp_path / "images" / "view000_pred.png")
    assert os.path.exists(tmp_path / "images" / "view001_gt.png")

    assert Evaluator(str(tmp_path)).summarize() is None  # empty case
