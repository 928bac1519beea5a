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


def _cpu_cache_dir(base: str) -> str:
    """XLA:CPU cache entries embed AOT machine code keyed WITHOUT the
    host's CPU features -- an entry written on a different CPU generation
    loads with 'machine type ... doesn't match' warnings and can SIGSEGV
    in backend_compile_and_load (observed r5: full-suite crash at 76%).
    Fingerprint the host ISA into the CPU cache path so each machine
    compiles its own entries; TPU (axon) entries stay in the shared dir."""
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    fp = hashlib.sha1(line.encode()).hexdigest()[:10]
                    return f"{base}_cpu_{fp}"
    except OSError:
        pass
    return base + "_cpu"


def setup_cache(path: str | None = None) -> None:
    """Enable the persistent XLA compilation cache (idempotent)."""
    base = path or DEFAULT_CACHE
    backend = None
    try:
        backend = jax.default_backend()
    except Exception:  # backend init failure: keep the shared dir
        pass
    if backend == "cpu":
        base = _cpu_cache_dir(base)
    jax.config.update("jax_compilation_cache_dir", base)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
