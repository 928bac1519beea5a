"""Runtime setup helpers.

First compile of each program over the TPU tunnel costs 20-60s; the
persistent compilation cache makes every later process start instantly
(SURVEY.md §5 observability/runtime plan).
"""

from __future__ import annotations

import os

import jax

DEFAULT_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def setup_cache(path: str | None = None) -> None:
    """Enable the persistent XLA compilation cache (idempotent)."""
    jax.config.update("jax_compilation_cache_dir", path or DEFAULT_CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
