"""Ray/geometry utilities.

Parity surface: reference ``src/utils/data_utils.py:601`` (``get_near_far``
AABB ray intersection) and ``base_utils.py:11`` (``perf_timer``).
"""
from __future__ import annotations

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
