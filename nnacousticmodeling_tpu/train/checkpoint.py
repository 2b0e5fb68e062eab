"""Checkpointing: pytrees <-> .npz files.

Replaces Chainer's npz serializers (train.py:371-395). Leaves are saved
by path-derived keys so files are inspectable and order-independent;
loading restores into a template pytree of the same structure.
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


def save_pytree(filename: str, tree: Any) -> None:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {_path_str(path): np.asarray(leaf) for path, leaf in flat}
    np.savez(filename, **arrays)


def load_pytree(filename: str, template: Any) -> Any:
    data = np.load(filename)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in flat:
        key = _path_str(path)
        if key not in data:
            raise KeyError(f"checkpoint missing {key}")
        arr = data[key]
        if arr.shape != tuple(np.shape(leaf)):
            raise ValueError(
                f"checkpoint {key}: shape {arr.shape} != template "
                f"{np.shape(leaf)}")
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)
