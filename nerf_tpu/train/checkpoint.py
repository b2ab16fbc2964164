"""Checkpoint I/O.

Parity surface: reference ``src/utils/net_utils.py:288-379`` — saves
{net, optim, scheduler(implicit in step), recorder, epoch} as ``latest`` +
``<epoch>`` files, prunes to the newest 5 epoch files, ``load_model`` returns
the next epoch, ``load_network`` restores weights only. Here a checkpoint is
one ``.npz`` of the flattened train-state pytree plus a small json meta.
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten(tree) -> Tuple[list, Any]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def _restore_leaf(arr: np.ndarray, like) -> np.ndarray:
    """Cast a loaded array to the template leaf's dtype.

    ml_dtypes leaves (bfloat16 hash tables) survive np.savez only as raw
    void bytes (``|V2``) — numpy has no cast from void, so reinterpret the
    bits instead (same itemsize guarantees a lossless round-trip)."""
    want = np.asarray(like).dtype
    if arr.dtype == want:
        return arr
    if arr.dtype.kind == "V" and arr.dtype.itemsize == want.itemsize:
        return arr.view(want)
    return np.asarray(arr, dtype=want)


def save_checkpoint(
    model_dir: str,
    state,
    epoch: int,
    recorder_state: Optional[Dict] = None,
    latest: bool = True,
    keep: int = 5,
):
    os.makedirs(model_dir, exist_ok=True)
    leaves, _ = _flatten(state)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    meta = {"epoch": epoch, "recorder": recorder_state or {}}

    def write(tag: str):
        np.savez(os.path.join(model_dir, f"{tag}.npz"), **arrays)
        with open(os.path.join(model_dir, f"{tag}.json"), "w") as f:
            json.dump(meta, f)

    write(str(epoch))
    if latest:
        write("latest")

    # prune to newest `keep` numeric checkpoints (net_utils.py:323-343)
    epochs = sorted(
        int(f[:-4]) for f in os.listdir(model_dir)
        if f.endswith(".npz") and f[:-4].isdigit()
    )
    for old in epochs[:-keep]:
        for ext in (".npz", ".json"):
            p = os.path.join(model_dir, f"{old}{ext}")
            if os.path.exists(p):
                os.remove(p)


def load_checkpoint(model_dir: str, template, tag: str = "latest"):
    """Restore a pytree with the same structure as ``template``.

    Returns (state, epoch, recorder_state) or None if missing.
    """
    npz_path = os.path.join(model_dir, f"{tag}.npz")
    if not os.path.exists(npz_path):
        return None
    data = np.load(npz_path)
    leaves, treedef = _flatten(template)
    if len(data.files) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(data.files)} leaves, expected {len(leaves)}"
        )
    new_leaves = [
        _restore_leaf(data[f"leaf_{i}"], l) for i, l in enumerate(leaves)
    ]
    state = jax.tree_util.tree_unflatten(treedef, new_leaves)
    meta_path = os.path.join(model_dir, f"{tag}.json")
    meta = {"epoch": -1, "recorder": {}}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, int(meta.get("epoch", -1)), meta.get("recorder", {})


def load_params(model_dir: str, params_template, tag: str = "latest"):
    """Weights-only restore (analog of net_utils.load_network:346-379).

    Works against a full-state checkpoint by matching the params subtree:
    the checkpoint stores the TrainState whose first leaves are the params
    (TrainState = (params, opt_state, step) in flatten order).
    """
    npz_path = os.path.join(model_dir, f"{tag}.npz")
    if not os.path.exists(npz_path):
        return None
    data = np.load(npz_path)
    leaves, treedef = _flatten(params_template)
    new_leaves = [
        _restore_leaf(data[f"leaf_{i}"], l) for i, l in enumerate(leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def wipe_dir(path: str):
    """Remove a directory tree (resume=False semantics, net_utils.py:289)."""
    if os.path.exists(path):
        shutil.rmtree(path)
