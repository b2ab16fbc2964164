"""Ray/geometry + small base utilities.

Parity surface: reference ``src/utils/data_utils.py:601`` (``get_near_far``
AABB ray intersection) and ``base_utils.py`` (``perf_timer`` :11, pickle IO
:62-70, ``load_object`` dynamic loader :139-144).
"""
from __future__ import annotations

import importlib
import os
import pickle
import time
from contextlib import contextmanager

import numpy as np


def get_near_far(
    rays_o: np.ndarray, rays_d: np.ndarray,
    bbox_min, bbox_max,
    min_near: float = 0.05,
):
    """Slab-method ray/AABB intersection.

    rays_o, rays_d: [N, 3]. Returns (near [N], far [N], hit [N] bool);
    misses get near=far=0.
    """
    xp = np
    rays_o = xp.asarray(rays_o)
    rays_d = xp.asarray(rays_d)
    inv = 1.0 / xp.where(xp.abs(rays_d) < 1e-10,
                         xp.where(rays_d < 0, -1e-10, 1e-10), rays_d)
    t0 = (xp.asarray(bbox_min) - rays_o) * inv
    t1 = (xp.asarray(bbox_max) - rays_o) * inv
    tmin = xp.minimum(t0, t1).max(axis=-1)
    tmax = xp.maximum(t0, t1).min(axis=-1)
    hit = (tmax >= tmin) & (tmax > 0)
    near = xp.where(hit, xp.maximum(tmin, min_near), 0.0)
    far = xp.where(hit, xp.maximum(tmax, near + 1e-6), 0.0)
    return near, far, hit


@contextmanager
def perf_timer(name: str = "block", log=print):
    """Wall-clock context timer (base_utils.perf_timer analog)."""
    t0 = time.time()
    yield
    log(f"{name}: {time.time() - t0:.4f}s")


def read_pickle(pkl_path):
    """Unpickle a file (base_utils.py:62-64)."""
    with open(pkl_path, "rb") as f:
        return pickle.load(f)


def save_pickle(data, pkl_path):
    """Pickle to a file, creating parent dirs (base_utils.py:67-70)."""
    parent = os.path.dirname(pkl_path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    with open(pkl_path, "wb") as f:
        pickle.dump(data, f)


def load_object(qualified_name: str, module_args: dict | None = None,
                **extra_args):
    """Instantiate ``pkg.mod.ClassName`` with kwargs (base_utils.py:139-144).

    The framework's factories use explicit registries; this generic loader
    is the escape hatch for user-provided classes named in configs.
    """
    module_name, obj_name = qualified_name.rsplit(".", 1)
    obj = getattr(importlib.import_module(module_name), obj_name)
    return obj(**{**(module_args or {}), **extra_args})
