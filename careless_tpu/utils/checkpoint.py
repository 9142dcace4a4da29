"""Keras-free weight checkpointing with the reference's warm-start/freeze UX.

Reference behavior: save_weights/load_weights at end of run
(/root/reference/careless/careless.py:79-80) with reload via
--structure-factor-file / --scale-file (careless.py:48-56). Here a params
pytree is flattened to path-keyed arrays in a single .npz file; loading
restores into an identically-structured pytree (shape-checked).
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_params(path: str, params: Any) -> None:
    if not path.endswith(".npz"):
        path = path + ".npz"
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {_path_str(p): np.asarray(v) for p, v in flat}
    np.savez(path, **arrays)


def load_params(path: str, like: Any) -> Any:
    """Load a checkpoint into the structure of `like` (shape-checked)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path) as data:
        stored = dict(data)
    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    out = []
    for p, v in flat:
        key = _path_str(p)
        if key not in stored:
            raise KeyError(f"checkpoint {path} missing parameter {key}")
        arr = stored[key]
        if arr.shape != np.shape(v):
            raise ValueError(
                f"checkpoint {path} parameter {key} has shape {arr.shape}, "
                f"expected {np.shape(v)}")
        out.append(jax.numpy.asarray(arr))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(like), out)
