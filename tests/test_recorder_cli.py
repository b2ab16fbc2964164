"""Recorder smoothing + CLI smoke tests."""
import subprocess
import sys

import numpy as np

from nerf_tpu.train.recorder import Recorder, SmoothedValue


def test_smoothed_value_window():
    sv = SmoothedValue(window_size=4)
    for v in [1, 2, 3, 4, 5, 6]:
        sv.update(v)
    assert sv.avg == (3 + 4 + 5 + 6) / 4
    assert sv.median == 4.5
    assert sv.global_avg == 21 / 6


def test_recorder_state_roundtrip(tmp_path):
    r = Recorder(str(tmp_path), use_tb=False)
    r.step, r.epoch = 42, 7
    r.update({"loss": 0.5, "psnr": 30.0})
    sd = r.state_dict()
    r2 = Recorder("", use_tb=False)
    r2.load_state_dict(sd)
    assert r2.step == 42 and r2.epoch == 7
    line = r.log_line({"lr": 1e-4})
    assert "loss" in line and "psnr" in line


def test_run_dataset_cli():
    out = subprocess.run(
        [sys.executable, "-u", "run.py", "--type", "dataset",
         "--cfg_file", "configs/nerf/lego.yaml",
         "train_dataset.data_root", "/root/reference/data/nerf_synthetic",
         "train_dataset.cams", "[0,5,1]",
         "train_dataset.input_ratio", "0.25"],
        capture_output=True, text=True, timeout=180,
        env={"PALLAS_AXON_POOL_IPS": "", "PATH": "/usr/local/bin:/usr/bin:/bin",
             "HOME": "/root"},
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-500:]
    assert "dataset ok: 5 items" in out.stdout


def test_run_unknown_type_errors():
    out = subprocess.run(
        [sys.executable, "run.py", "--type", "bogus",
         "--cfg_file", "configs/nerf/lego.yaml"],
        capture_output=True, text=True, timeout=120,
        env={"PALLAS_AXON_POOL_IPS": "", "PATH": "/usr/local/bin:/usr/bin:/bin",
             "HOME": "/root"},
        cwd="/root/repo",
    )
    assert out.returncode == 1
    assert "unknown --type" in out.stdout
