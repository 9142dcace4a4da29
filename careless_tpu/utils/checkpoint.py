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


def save_state(path: str, params: Any, opt_state: Any, step: int,
               history: dict) -> None:
    """Mid-run training checkpoint: params + optimizer state + step +
    history (SURVEY §5.4's recommended extension — the reference only
    warm-starts from final weights). One .npz; atomic via temp rename."""
    import os
    if not path.endswith(".npz"):
        path = path + ".npz"
    arrays = {}
    for prefix, tree in (("params", params), ("opt", opt_state)):
        for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]:
            arrays[prefix + "/" + _path_str(p)] = np.asarray(v)
    arrays["__step__"] = np.int64(step)
    for k, v in history.items():
        arrays["history/" + k] = np.asarray(v, np.float64)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


def load_state(path: str, params_like: Any, opt_state_like: Any):
    """Restore (params, opt_state, step, history) saved by save_state;
    pytrees are shape-checked against the provided structures."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path) as data:
        stored = dict(data)

    params = _restore_tree(stored, params_like, path, prefix="params/")
    opt_state = _restore_tree(stored, opt_state_like, path, prefix="opt/")
    step = int(stored["__step__"])
    history = {k[len("history/"):]: stored[k].tolist()
               for k in stored if k.startswith("history/")}
    return params, opt_state, step, history


def _restore_tree(stored: dict, like: Any, path: str,
                  prefix: str = "") -> Any:
    """Rebuild a pytree of `like`'s structure from path-keyed arrays
    (shape-checked; dtypes follow `like`)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(like)
    out = []
    for p, v in flat:
        key = prefix + _path_str(p)
        if key not in stored:
            raise KeyError(f"checkpoint {path} missing parameter {key}")
        arr = stored[key]
        if arr.shape != np.shape(v):
            raise ValueError(
                f"checkpoint {path} parameter {key} has shape {arr.shape}, "
                f"expected {np.shape(v)}")
        out.append(jax.numpy.asarray(arr, np.asarray(v).dtype))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(like), out)


def load_params(path: str, like: Any) -> Any:
    """Load a checkpoint into the structure of `like` (shape-checked)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path) as data:
        stored = dict(data)
    return _restore_tree(stored, like, path)
