"""End-to-end img_fit (the minimum slice): train on a tiny view, eval."""
import json
import os

import imageio.v2 as imageio
import numpy as np
import pytest

from nerf_tpu.config import make_cfg


@pytest.fixture
def tiny_view(tmp_path):
    """A 1-frame Blender-format scene with a smooth, easy-to-fit image."""
    scene = tmp_path / "data" / "lego"
    (scene / "train").mkdir(parents=True)
    yy, xx = np.mgrid[0:32, 0:32].astype(np.float32) / 31.0
    img = np.stack([xx, yy, 0.5 * (xx + yy), np.ones_like(xx)], axis=-1)
    imageio.imwrite(str(scene / "train" / "r_0.png"),
                    (img * 255).astype(np.uint8))
    meta = {"camera_angle_x": 0.7, "frames": [
        {"file_path": "./train/r_0",
         "transform_matrix": np.eye(4).tolist()}]}
    with open(scene / "transforms_train.json", "w") as f:
        json.dump(meta, f)
    return str(tmp_path / "data")


def _cfg(tiny_view, tmp_path, **over):
    opts = [
        "train_dataset.data_root", tiny_view,
        "test_dataset.data_root", tiny_view,
        "train_dataset.N_pixels", "256",
        "train_dataset.input_ratio", "1.0",
        "test_dataset.input_ratio", "1.0",
        "network.mlp.D", "2", "network.mlp.W", "32",
        "ep_iter", "20", "train.epoch", "3",
        "save_latest_ep", "1", "eval_ep", "10", "log_interval", "20",
        "workspace", str(tmp_path / "ws"),
    ]
    for k, v in over.items():
        opts += [k, str(v)]
    return make_cfg("configs/img_fit/lego_view0.yaml", opts)


def test_img_fit_dataset(tiny_view):
    from nerf_tpu.data.img_fit import ImgFitDataset

    ds = ImgFitDataset(data_root=tiny_view, scene="lego", n_pixels=64)
    assert ds.image.shape == (32, 32, 3)
    assert ds.uv.shape == (32 * 32, 2) and ds.rgb.shape == (32 * 32, 3)
    assert float(ds.uv.min()) == 0.0 and float(ds.uv.max()) == 1.0
    # uv ordering matches the row-major image flatten
    np.testing.assert_allclose(ds.rgb.reshape(32, 32, 3), ds.image, atol=1e-6)


def test_img_fit_train_and_eval(tiny_view, tmp_path):
    from nerf_tpu.train.img_fit_loop import eval_img_fit, train_img_fit

    cfg = _cfg(tiny_view, tmp_path)
    state, _ = train_img_fit(cfg)
    assert int(state.step) == 3 * 20
    assert os.path.exists(os.path.join(cfg.trained_model_dir, "latest.npz"))

    out = eval_img_fit(cfg)
    assert float(out) > 12.0  # smooth ramp fits quickly even in 60 steps
    res_dir = cfg.result_dir
    metrics = json.load(open(os.path.join(res_dir, "metrics.json")))
    assert "psnr" in metrics
    assert os.path.exists(os.path.join(res_dir, "gt_pred.jpg"))

    # resume: a second call continues past the checkpoint without redoing work
    cfg2 = _cfg(tiny_view, tmp_path, **{"train.epoch": 4})
    state2, _ = train_img_fit(cfg2)
    assert int(state2.step) == 4 * 20
