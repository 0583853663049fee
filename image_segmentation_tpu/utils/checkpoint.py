"""Pytree checkpoints as flat .npz archives.

A superset of the reference's checkpointing (which torch.save's a bare
state_dict every epoch and can NEVER resume mid-training — no optimizer
state or step is stored anywhere; model_wrappers.py:249,1047):

- params AND optimizer state AND batch_stats AND step/epoch are stored;
- single portable file, no framework pickle;
- keys are '/'-joined pytree paths so checkpoints survive refactors that
  keep module names.

Single-writer discipline: in multi-process runs only process 0 writes
(the reference's rank-0-only torch.save, model_wrappers.py:1042-1047).
"""

from __future__ import annotations

import io
import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np


def _flatten(tree: Any) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(_path_str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _path_str(entry) -> str:
    if hasattr(entry, "key"):
        return str(entry.key)
    if hasattr(entry, "idx"):
        return str(entry.idx)
    if hasattr(entry, "name"):
        return str(entry.name)
    return str(entry)


def save_checkpoint(path: str, tree: Any) -> None:
    """Save a pytree (e.g. TrainState-as-dict) to ``path`` (.npz)."""
    if jax.process_index() != 0:
        return
    flat = _flatten(jax.device_get(tree))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path)


def load_checkpoint_flat(path: str) -> Dict[str, np.ndarray]:
    """Load the flat {path: array} dict from a checkpoint file."""
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def restore_into(template: Any, path: str) -> Any:
    """Restore a checkpoint into the structure of ``template``.

    Arrays are matched by flattened key; shapes must agree.  Keys present in
    the template but missing from the file raise (strict load, like the
    reference's default state_dict load).
    """
    flat = load_checkpoint_flat(path)
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for pth, leaf in leaves_with_path:
        key = "/".join(_path_str(p) for p in pth)
        if key not in flat:
            raise KeyError(f"checkpoint {path} missing key {key!r}")
        arr = flat[key]
        if hasattr(leaf, "shape") and tuple(arr.shape) != tuple(leaf.shape):
            raise ValueError(
                f"shape mismatch for {key!r}: checkpoint {arr.shape} vs "
                f"template {leaf.shape}"
            )
        if hasattr(leaf, "dtype"):
            arr = arr.astype(leaf.dtype)
        new_leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def latest_checkpoint(run_dir: str, prefix: str = "model_") -> Optional[str]:
    """Find the newest ``model_<epoch>.npz`` in a run folder."""
    if not os.path.isdir(run_dir):
        return None
    best, best_epoch = None, -1
    pat = re.compile(re.escape(prefix) + r"(\d+)\.npz$")
    for name in os.listdir(run_dir):
        m = pat.match(name)
        if m and int(m.group(1)) > best_epoch:
            best, best_epoch = os.path.join(run_dir, name), int(m.group(1))
    return best
