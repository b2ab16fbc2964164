"""Tracing / profiling utilities.

The reference's observability is wall-clock brackets + cuda syncs
(SURVEY.md §5). TPU-native equivalents: ``jax.profiler`` trace capture and
explicit rays/s counters with honest host-transfer syncs.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace (view with tensorboard or xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def sync(tree) -> None:
    """Honest device sync: force a host transfer of one leaf (on some PJRT
    plugins block_until_ready returns before execution completes)."""
    import jax

    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        np.asarray(leaves[-1])


class RaysPerSecond:
    """Running rays/s counter with warmup-drop, mirroring the reference's
    mean-net-time protocol (run.py:87-93, first frame dropped)."""

    def __init__(self, drop_first: int = 1):
        self.drop_first = drop_first
        self.samples = []
        self._t0: Optional[float] = None
        self._rays = 0

    @contextlib.contextmanager
    def measure(self, n_rays: int, result=None):
        """Time a block; yields a ``done(result)`` callback to register the
        output produced inside the block — it is host-synced before the
        timer stops (results created mid-block can't be passed at entry)."""
        holder = [result]
        t0 = time.time()
        yield lambda res: holder.__setitem__(0, res)
        if holder[0] is not None:
            sync(holder[0])
        self.samples.append((n_rays, time.time() - t0))

    def summary(self) -> Dict[str, float]:
        kept = self.samples[self.drop_first:] or self.samples
        if not kept:
            return {"rays_per_s": 0.0, "mean_time_s": 0.0, "fps": 0.0,
                    "frames": 0}
        total_rays = sum(n for n, _ in kept)
        total_t = sum(t for _, t in kept)
        mean_t = total_t / len(kept)
        return {
            "rays_per_s": total_rays / total_t if total_t else 0.0,
            "mean_time_s": mean_t,
            "fps": 1.0 / mean_t if mean_t else 0.0,
            "frames": len(kept),
        }


def memory_stats() -> Dict[str, float]:
    """Device memory stats where the backend exposes them."""
    import jax

    out = {}
    for d in jax.local_devices():
        try:
            ms = d.memory_stats()
            if ms:
                out[str(d)] = {
                    "bytes_in_use": ms.get("bytes_in_use", 0),
                    "peak_bytes_in_use": ms.get("peak_bytes_in_use", 0),
                }
        except Exception:
            pass
    return out
