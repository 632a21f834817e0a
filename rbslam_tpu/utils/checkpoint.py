"""Checkpoint / resume at the smoother-sweep boundary.

The reference only has coarse save/load of final results between "run"
and "plot" phases (slam-dense-radio/main.m:43-46) with no mid-run resume.
Here the natural checkpoint boundary is the end of each CPF-AS sweep k —
state = (sampled trajectory, map, covariance, accumulated outputs, PRNG
key), exactly what sweep k+1 consumes (SURVEY §5). Format: one .npz per
step on host; pytree structure round-trips by flattened key path.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import numpy as np

_STEP_RE = re.compile(r"ckpt_(\d+)\.npz$")


def _flatten(tree: Any) -> dict:
    flat = {}
    leaves = jax.tree_util.tree_leaves_with_path(tree)
    for path, leaf in leaves:
        key = jax.tree_util.keystr(path)
        flat[key] = np.asarray(leaf)
    return flat


def save_checkpoint(directory: str, step: int, tree: Any) -> str:
    """Save a pytree of arrays as ckpt_{step}.npz (atomic rename)."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"ckpt_{step}.npz")
    tmp = path + ".tmp.npz"
    np.savez(tmp, **_flatten(tree))
    os.replace(tmp, path)
    return path


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = [
        int(m.group(1))
        for f in os.listdir(directory)
        if (m := _STEP_RE.search(f))
    ]
    return max(steps) if steps else None


def load_checkpoint(directory: str, step: int, like: Any) -> Any:
    """Restore a pytree saved by save_checkpoint; `like` provides the
    structure (its leaf values are ignored)."""
    path = os.path.join(directory, f"ckpt_{step}.npz")
    data = np.load(path)
    leaves_with_path = jax.tree_util.tree_leaves_with_path(like)
    values = [data[jax.tree_util.keystr(p)] for p, _ in leaves_with_path]
    treedef = jax.tree_util.tree_structure(like)
    return jax.tree_util.tree_unflatten(treedef, values)
