"""Debug modes: NaN checking and pytree audits.

The reference contains NaN/Inf by clamping in the optimizer kernels
(SURVEY.md §5 race/failure detection); TPU-side we additionally offer a
debug mode that makes any NaN-producing op raise (jax_debug_nans) and a
pytree finiteness audit for use in tests/CLI --debug runs.
"""

from __future__ import annotations

import contextlib
from typing import Any

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def nan_check():
    """Raise on the first NaN produced by any jitted op."""
    prev = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_all_finite(tree: Any, name: str = "pytree") -> None:
    """Audit every leaf for NaN/Inf; raises with the offending path."""
    leaves = jax.tree_util.tree_leaves_with_path(tree)
    for path, leaf in leaves:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                     jnp.floating):
            if not bool(jnp.all(jnp.isfinite(leaf))):
                raise AssertionError(
                    f"non-finite values in {name}{jax.tree_util.keystr(path)}")
