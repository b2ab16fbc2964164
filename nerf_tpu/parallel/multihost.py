"""Multi-host helpers: process gating, gathers, broadcasts.

Parity surface: the reference's rank-0 gating of checkpoint/eval/logging
(train.py:68-85, recorder.py:51) and DDP barrier helper (train.py:100-112).
TPU-native: ``jax.process_index`` + ``multihost_utils`` collectives over the
pod slice.
"""
from __future__ import annotations

import jax
import numpy as np


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return jax.process_index() == 0


def barrier(name: str = "barrier"):
    """Cross-host sync point (reference synchronize(), train.py:100-112)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def broadcast_from_main(tree):
    """Broadcast host-0's pytree values to all hosts."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)


def gather_to_main(x):
    """All-gather per-host arrays; every host receives the stacked result
    (use on host 0 for eval aggregation / checkpoint of sharded state)."""
    if jax.process_count() == 1:
        return np.asarray(x)[None]
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x))


def fully_replicated_host_local(tree):
    """Pull a (replicated) global array back to host-local numpy for
    checkpointing on host 0."""
    return jax.tree_util.tree_map(lambda a: np.asarray(a), tree)
