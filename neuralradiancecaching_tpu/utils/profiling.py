"""Profiling/tracing helpers.

Replaces the reference's FPS-title-bar + frame-dt Time class (SURVEY.md §5)
with jax.profiler traces and named phase timers.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulating wall-clock timers keyed by phase name. Forces device
    sync at phase end so GPU/TPU async dispatch doesn't hide the cost."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                # scalar device->host read is the reliable sync (the axon
                # platform's block_until_ready can return early)
                np.asarray(jax.tree_util.tree_leaves(sync_on)[0]).sum()
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name}: {t:.3f}s total, {t / c * 1000:.1f} ms/call"
                         f" x{c}")
        return "\n".join(lines)


def rays_per_second(n_rays: int, seconds: float) -> float:
    return n_rays / max(seconds, 1e-12) / 1e6  # Mrays/s
