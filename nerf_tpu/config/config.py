"""Config system: attribute-access dict tree loaded from yaml.

Keeps the same yaml surface as the reference (task_arg / network /
train_dataset / test_dataset / train / test / eval keys, recursive
``parent_cfg`` merge, trailing dotted CLI overrides — see reference
``src/config/config.py:185-204``) but with no import-time side effects
and explicit registries instead of path-based module loading.
"""
from __future__ import annotations

import argparse
import copy
import os
from typing import Any, Dict, List, Optional

import yaml


class Config(dict):
    """dict with attribute access, recursive over nested dicts."""

    def __init__(self, d: Optional[Dict[str, Any]] = None, **kwargs):
        super().__init__()
        d = dict(d or {})
        d.update(kwargs)
        for k, v in d.items():
            self[k] = self._wrap(v)

    @classmethod
    def _wrap(cls, v):
        if isinstance(v, dict) and not isinstance(v, Config):
            return cls(v)
        if isinstance(v, (list, tuple)):
            return type(v)(cls._wrap(x) for x in v)
        return v

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = self._wrap(value)

    def __setitem__(self, name, value):
        super().__setitem__(name, self._wrap(value))

    def get_path(self, dotted: str, default=None):
        node: Any = self
        for part in dotted.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node

    def set_path(self, dotted: str, value):
        parts = dotted.split(".")
        node = self
        for part in parts[:-1]:
            if part not in node or not isinstance(node[part], Config):
                node[part] = Config()
            node = node[part]
        node[parts[-1]] = value

    def merge(self, other: Dict[str, Any]) -> "Config":
        """Recursively merge ``other`` into self (other wins)."""
        for k, v in other.items():
            if (
                k in self
                and isinstance(self[k], Config)
                and isinstance(v, dict)
            ):
                self[k].merge(v)
            else:
                self[k] = self._wrap(v)
        return self

    def clone(self) -> "Config":
        return copy.deepcopy(self)

    def to_dict(self) -> Dict[str, Any]:
        out = {}
        for k, v in self.items():
            if isinstance(v, Config):
                out[k] = v.to_dict()
            elif isinstance(v, (list, tuple)):
                out[k] = [x.to_dict() if isinstance(x, Config) else x for x in v]
            else:
                out[k] = v
        return out


def _coerce(value: str):
    """Parse a CLI override string into a python value.

    Numeric first (YAML 1.1 treats "1e-3" as a string), then yaml rules for
    bools/lists/dicts/null."""
    try:
        return int(value)
    except ValueError:
        pass
    try:
        return float(value)
    except ValueError:
        pass
    try:
        return yaml.safe_load(value)
    except yaml.YAMLError:
        return value


def default_cfg() -> Config:
    """Default config tree. Mirrors the reference defaults
    (``src/config/config.py:8-139``) for the keys the nerf/img_fit tasks use.
    """
    return Config(
        {
            "task": "nerf",
            "exp_name": "default",
            "scene": "lego",
            "gpus": [0],
            "resume": True,
            "distributed": False,
            # registry names (replaces the reference's *_module file paths)
            "train_dataset_module": "blender",
            "test_dataset_module": "blender",
            "network_module": "nerf",
            "renderer_module": "volume",
            "loss_module": "nerf",
            "evaluator_module": "nerf",
            "task_arg": {
                "N_rays": 1024,
                "chunk_size": 4096,
                "white_bkgd": 1,
                "N_samples": 64,
                "N_importance": 128,
                "no_batching": True,
                "use_viewdirs": True,
                "lindisp": False,
                "perturb": 1.0,
                "raw_noise_std": 0.0,
                "use_pe": True,
                "test_skip": 1,
                "precrop_iters": 0,
                "precrop_frac": 0.5,
            },
            "network": {
                "nerf": {"W": 256, "D": 8, "V_D": 1, "skips": [4]},
                "xyz_encoder": {"type": "frequency", "input_dim": 3, "freq": 10},
                "dir_encoder": {"type": "frequency", "input_dim": 3, "freq": 4},
                # compute dtype for the MLP matmuls: float32 | bfloat16
                "dtype": "bfloat16",
            },
            "train_dataset": {
                "data_root": "data/nerf_synthetic",
                "split": "train",
                "input_ratio": 1.0,
                "cams": [0, -1, 1],
                "H": 800,
                "W": 800,
            },
            "test_dataset": {
                "data_root": "data/nerf_synthetic",
                "split": "test",
                "input_ratio": 1.0,
                "cams": [0, -1, 1],
                "H": 800,
                "W": 800,
            },
            "train": {
                "batch_size": 1,
                "lr": 5e-4,
                "weight_decay": 0.0,
                "epoch": 600,
                "optim": "adam",
                "scheduler": {"type": "exponential", "gamma": 0.1, "decay_epochs": 500},
                "num_workers": 0,
            },
            "test": {"batch_size": 1},
            "eval": {"whole_img": True},
            "ep_iter": 500,
            "save_ep": 40,
            "eval_ep": 40,
            "save_latest_ep": 10,
            "log_interval": 10,
            "fix_random": False,
            "near": 2.0,
            "far": 6.0,
            # video rendering
            "write_video": False,
            "render_path": True,
            "fps": 24,
            "render_num": 120,
            "render_type": "spiral",
            "background_strategy": "none",
            # ESS / ERT
            "enable_ess": True,
            "enable_ert": True,
            "ert_threshold": 0.01,
            "occupancy_grid_resolution": 128,
            # TPU kernel path (analog of the reference's use_cuda_kernels)
            "use_pallas_kernels": True,
            # ray tiling for whole-image rendering (static-shape tiles)
            "render_tile_rays": 8192,
            # parallelism
            "mesh": {"data": -1},  # -1 = all available devices on the data axis
            # dirs
            "workspace": "workspace",
            "record_dir": "",
            "result_dir": "",
            "trained_model_dir": "",
        }
    )


def load_cfg(cfg_file: str) -> Config:
    """Load a yaml file, recursively merging its ``parent_cfg`` chain
    (parent first, child overrides) — same semantics as the reference's
    ``make_cfg`` (``src/config/config.py:185-204``)."""
    with open(cfg_file, "r") as f:
        current = yaml.safe_load(f) or {}
    if "parent_cfg" in current:
        parent_path = current.pop("parent_cfg")
        if not os.path.isabs(parent_path):
            # resolve relative to the child yaml's directory, falling back
            # to cwd-relative (how the reference configs reference parents)
            cand = os.path.join(os.path.dirname(cfg_file), parent_path)
            if os.path.exists(cand):
                parent_path = cand
        parent = load_cfg(parent_path)
        parent.merge(current)
        return parent
    return Config(current)


def _git_describe(args: str) -> str:
    import subprocess

    try:
        out = subprocess.run(["git", "describe"] + args.split(),
                             capture_output=True, text=True, timeout=5)
        return out.stdout.strip()
    except Exception:
        return ""


def parse_cfg(cfg: Config) -> Config:
    """Derive output directories: <workspace>/<kind>/<task>/<scene>/<exp_name>
    (reference ``src/config/config.py:169-178``), after the reference's
    exp_name transforms (:151-167): bbox cube-ification, exp_name_tag
    suffix, gitbranch/gitcommit substitution."""
    if cfg.get("bbox"):
        import numpy as np

        bbox = np.asarray(cfg.bbox, np.float64).reshape(2, 3)
        center = bbox.mean(axis=0)
        half = float((bbox[1] - bbox[0]).max()) / 2.0
        cfg.bbox = np.stack([center - half, center + half]).reshape(6).tolist()

    if cfg.get("exp_name_tag"):
        cfg.exp_name = f"{cfg.exp_name}_{cfg.exp_name_tag}"
    if "gitbranch" in cfg.exp_name:
        # "heads/<branch>" -> "<branch>" (the reference strips "heads/")
        cfg.exp_name = cfg.exp_name.replace(
            "gitbranch", _git_describe("--all")[6:] or "nobranch")
    if "gitcommit" in cfg.exp_name:
        cfg.exp_name = cfg.exp_name.replace(
            "gitcommit", _git_describe("--tags --always") or "nocommit")

    tail = os.path.join(cfg.task, cfg.get("scene", ""), cfg.exp_name)
    ws = cfg.get("workspace", "workspace")
    if not cfg.get("trained_model_dir"):
        cfg.trained_model_dir = os.path.join(ws, "trained_model", tail)
    if not cfg.get("record_dir"):
        cfg.record_dir = os.path.join(ws, "record", tail)
    if not cfg.get("result_dir"):
        cfg.result_dir = os.path.join(ws, "result", tail)
    return cfg


def make_cfg(cfg_file: Optional[str] = None, opts: Optional[List[str]] = None) -> Config:
    """defaults <- yaml chain <- dotted CLI opts (``key value`` pairs)."""
    cfg = default_cfg()
    if cfg_file:
        cfg.merge(load_cfg(cfg_file))
    opts = list(opts or [])
    if len(opts) % 2 != 0:
        raise ValueError(f"opts must be key/value pairs, got {opts}")
    for key, val in zip(opts[::2], opts[1::2]):
        cfg.set_path(key, _coerce(val))
    return parse_cfg(cfg)


def parse_args(argv: Optional[List[str]] = None):
    """CLI surface mirroring the reference: --cfg_file --test --type plus
    trailing dotted-key overrides."""
    parser = argparse.ArgumentParser(description="nerf_tpu")
    parser.add_argument("--cfg_file", default=None)
    parser.add_argument("--test", action="store_true")
    parser.add_argument("--type", default="")
    parser.add_argument("--det", default="")
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = parser.parse_args(argv)
    cfg = make_cfg(args.cfg_file, args.opts)
    return cfg, args
