"""Checkpoint / resume for training state.

The reference has NO checkpointing (SURVEY.md §5) -- its closest artifact is
a debug stdout weight dump (NeuralRadianceCache.cpp:558-594). Here any
pytree (NRCState, MnistState, ImageFitState, ...) round-trips through a
numpy .npz with no extra dependencies.

Leaves are stored under their pytree key paths (not positionally), and
load() verifies path, shape, AND dtype against the template so a checkpoint
from a different config/model cannot load silently.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from typing import Any

import jax
import numpy as np


def _flatten_with_paths(tree: Any):
    """[(name, leaf)], treedef — names from pytree key paths."""
    flat_p, treedef = jax.tree_util.tree_flatten_with_path(tree)
    named = [(jax.tree_util.keystr(path) or f".leaf_{i}", leaf)
             for i, (path, leaf) in enumerate(flat_p)]
    return named, treedef


def config_hash(cfg: Any) -> str:
    """Stable hash of a (nested) config dataclass, for checkpoint metadata."""
    if dataclasses.is_dataclass(cfg):
        cfg = dataclasses.asdict(cfg)
    blob = json.dumps(cfg, sort_keys=True, default=str).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def save(path: str, tree: Any, metadata: dict | None = None) -> None:
    """Save a pytree to `<path>.npz` (+ sidecar metadata json)."""
    named, _ = _flatten_with_paths(tree)
    arrays = {name: np.asarray(x) for name, x in named}
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz", **arrays)
    if metadata is not None:
        with open(path.removesuffix(".npz") + ".meta.json", "w") as f:
            json.dump(metadata, f)


def load(path: str, like: Any, expect_config_hash: str | None = None) -> Any:
    """Load a pytree saved by :func:`save`, shaped like `like`.

    Verifies key paths, shapes, and dtypes; optionally the config hash
    recorded in the sidecar metadata. Positionally-keyed checkpoints from
    the old format (leaf_<i>) are still readable.
    """
    if not path.endswith(".npz"):
        path = path + ".npz"
    if expect_config_hash is not None:
        meta = load_metadata(path) or {}
        got = meta.get("config_hash")
        if got is not None and got != expect_config_hash:
            raise ValueError(
                f"checkpoint config hash mismatch: checkpoint was written "
                f"with config {got}, current config is {expect_config_hash}")
    data = np.load(path)
    named, treedef = _flatten_with_paths(like)
    legacy = all(k.startswith("leaf_") for k in data.files)
    leaves = []
    for i, (name, want) in enumerate(named):
        key = f"leaf_{i}" if legacy else name
        if key not in data:
            raise ValueError(
                f"checkpoint missing leaf {name!r}; it holds "
                f"{sorted(data.files)[:8]}... — wrong model/config?")
        got = data[key]
        want = np.asarray(want)
        if got.shape != want.shape:
            raise ValueError(f"checkpoint shape mismatch at {name}: "
                             f"{got.shape} vs {want.shape}")
        if got.dtype != want.dtype:
            raise ValueError(f"checkpoint dtype mismatch at {name}: "
                             f"{got.dtype} vs {want.dtype}")
        leaves.append(jax.numpy.asarray(got))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_metadata(path: str) -> dict | None:
    meta_path = path.removesuffix(".npz") + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return None
