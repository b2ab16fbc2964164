"""Device mesh + sharding rules.

TPU-native replacement for the reference's distributed layer (NCCL process
group + DDP + DistributedSampler, train.py:116-120 / trainer.py:14-21 /
samplers.py:75-131): a 1-D ``data`` mesh over all chips; rays/pixels are
sharded along it, parameters are replicated, and gradient all-reduce is the
``psum`` XLA inserts for the replicated-param gradient — riding ICI,
overlapped with backward by the latency-hiding scheduler.

Multi-host: call ``init_distributed()`` once per host before device use;
the mesh then spans the whole pod slice.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None):
    """Multi-host init (jax.distributed); no-op for single-process."""
    try:
        if coordinator:
            jax.distributed.initialize(coordinator_address=coordinator)
        else:
            jax.distributed.initialize()
    except (ValueError, RuntimeError):
        pass  # single-process / already initialized


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(mesh: Mesh, x, axis: str = "data"):
    """Shard the leading (ray) dimension across the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), x
    )


def replicate(mesh: Mesh, x):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), x)
