"""Config system: parent-chain merge, dotted overrides, derived dirs."""
import os

import pytest

from nerf_tpu.config import Config, default_cfg, load_cfg, make_cfg


def test_attr_access_and_nesting():
    c = Config({"a": {"b": 1}, "c": [1, {"d": 2}]})
    assert c.a.b == 1
    assert c.c[1].d == 2
    c.a.e = 3
    assert c["a"]["e"] == 3


def test_merge_override():
    c = Config({"a": {"b": 1, "c": 2}})
    c.merge({"a": {"b": 9}, "d": 4})
    assert c.a.b == 9 and c.a.c == 2 and c.d == 4


def test_parent_chain(tmp_path):
    parent = tmp_path / "parent.yaml"
    parent.write_text("task: nerf\ntrain:\n  lr: 0.1\n  epoch: 5\n")
    child = tmp_path / "child.yaml"
    child.write_text(
        f"parent_cfg: {parent}\ntrain:\n  lr: 0.2\nscene: lego\n"
    )
    cfg = load_cfg(str(child))
    assert cfg.train.lr == 0.2        # child wins
    assert cfg.train.epoch == 5       # parent preserved
    assert cfg.scene == "lego"


def test_cli_opts_coercion(tmp_path):
    f = tmp_path / "c.yaml"
    f.write_text("task: nerf\n")
    cfg = make_cfg(str(f), ["train.lr", "1e-3", "enable_ess", "False",
                            "task_arg.N_rays", "2048", "gpus", "[0,1]"])
    assert cfg.train.lr == 1e-3 and cfg.train.lr != "1e-3"
    assert cfg.enable_ess is False
    assert cfg.task_arg.N_rays == 2048
    assert cfg.gpus == [0, 1]


def test_odd_opts_rejected(tmp_path):
    f = tmp_path / "c.yaml"
    f.write_text("task: nerf\n")
    with pytest.raises(ValueError):
        make_cfg(str(f), ["only_key"])


def test_derived_dirs():
    cfg = make_cfg(None, ["task", "nerf", "scene", "lego", "exp_name", "e1"])
    assert cfg.trained_model_dir.endswith(os.path.join("nerf", "lego", "e1"))
    assert "record" in cfg.record_dir and "result" in cfg.result_dir


def test_defaults_complete():
    cfg = default_cfg()
    # the reference yaml surface keys exist
    for key in ("task_arg", "network", "train_dataset", "test_dataset",
                "train", "test", "eval", "ep_iter", "save_ep", "eval_ep"):
        assert key in cfg
    assert cfg.task_arg.N_samples == 64
    assert cfg.network.nerf.W == 256


def test_lego_400_coarse_config():
    from nerf_tpu.config import make_cfg
    from nerf_tpu.render.renderer import RenderOptions

    cfg = make_cfg("configs/nerf/lego_400_coarse.yaml", [])
    assert cfg.task_arg.N_importance == 0
    assert cfg.train_dataset.input_ratio == 0.5
    opts = RenderOptions.from_cfg(cfg)
    assert opts.n_importance == 0 and opts.n_samples == 64
    # exp dirs must not collide with the full run
    assert "nerf_400_coarse" in cfg.trained_model_dir


def test_parse_cfg_exp_name_transforms():
    from nerf_tpu.config import make_cfg

    cfg = make_cfg("configs/nerf/lego.yaml", [
        "exp_name", "run_gitcommit", "exp_name_tag", "ablation",
    ])
    # tag appended first, then gitcommit substituted with a real hash
    assert cfg.exp_name.startswith("run_")
    assert cfg.exp_name.endswith("_ablation")
    assert "gitcommit" not in cfg.exp_name
    assert cfg.exp_name in cfg.trained_model_dir


def test_parse_cfg_bbox_cubeified():
    from nerf_tpu.config import make_cfg

    cfg = make_cfg("configs/nerf/lego.yaml", [
        "bbox", "[0,0,0,2,4,8]",
    ])
    import numpy as np

    bbox = np.asarray(cfg.bbox).reshape(2, 3)
    size = bbox[1] - bbox[0]
    assert np.allclose(size, size.max())          # cube
    assert np.allclose(bbox.mean(0), [1, 2, 4])   # center preserved
