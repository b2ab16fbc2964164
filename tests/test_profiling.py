"""Tests for nerf_tpu.utils.profiling (tracing/rays-per-s counters)."""
import numpy as np

from nerf_tpu.utils.profiling import RaysPerSecond, memory_stats, sync, trace


def test_rays_per_second_protocol():
    meter = RaysPerSecond(drop_first=1)
    assert meter.summary()["frames"] == 0

    import time

    for i in range(3):
        with meter.measure(1000) as done:
            time.sleep(0.01 if i == 0 else 0.001)
            done(np.ones((4,)))  # synced before the timer stops
    s = meter.summary()
    assert s["frames"] == 2  # first (compile) frame dropped
    assert s["rays_per_s"] > 0 and s["fps"] > 0
    # dropped frame was the slow one, so mean reflects the fast frames
    assert s["mean_time_s"] < meter.samples[0][1]


def test_sync_and_trace(tmp_path):
    import jax.numpy as jnp

    sync({"a": jnp.ones((3,)), "b": [jnp.zeros(2)]})
    sync([])  # empty tree is a no-op

    with trace(str(tmp_path / "trace")) as d:
        _ = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    assert (tmp_path / "trace").exists() or d  # trace dir written (backend-dependent layout)

    stats = memory_stats()
    assert isinstance(stats, dict)
