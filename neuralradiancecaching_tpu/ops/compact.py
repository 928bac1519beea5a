"""O(n) stream compaction: cumsum + scatter instead of argsort.

Every compaction site in the renderer (cache-query packing, scatter-event
packing, march live-lane packing) previously used ``jnp.argsort(~mask)`` to
move selected lanes to the front. XLA sorts are O(n log^2 n) bitonic
networks; at frame scale (2M rays, 12M event slots) the sort dominates the
compaction and forced small row bands (docs/PERFORMANCE.md r2 band sweep).

A stable compaction needs no sort: the destination slot of each selected
lane is its exclusive prefix count. One cumsum + one scatter is O(n) and
keeps the exact stability/determinism guarantees of the argsort
(first-come-first-packed in lane order, deterministic overflow on the
highest-index lanes).

The reference has no analogue -- its GPU fragment/compute threads simply
diverge (nrc-forward.frag:779-791); lane packing is the TPU-native
replacement for that divergence.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def compact_select(mask: jnp.ndarray, cap: int
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pack the indices of True lanes to the front, in lane order.

    mask: (n,) bool. Returns (sel (cap,) int32, sel_valid (cap,) bool):
    the first min(count, cap) entries of `sel` are the indices of the first
    True lanes; entries beyond the count are padding (sel_valid False, index
    arbitrary). True lanes beyond `cap` are dropped deterministically
    (highest lane indices first) -- same overflow contract as the argsort
    this replaces.
    """
    n = mask.shape[0]
    mask = mask.astype(jnp.bool_)
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1           # (n,)
    slot = jnp.where(mask & (pos < cap), pos, cap)
    sel = jnp.zeros((cap + 1,), jnp.int32).at[slot].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")[:cap]
    count = jnp.minimum(jnp.sum(mask.astype(jnp.int32)), cap)
    sel_valid = jnp.arange(cap, dtype=jnp.int32) < count
    return sel, sel_valid


def scatter_back(n: int, sel: jnp.ndarray, sel_valid: jnp.ndarray,
                 values: jnp.ndarray, fill) -> jnp.ndarray:
    """Inverse of compact_select: place `values[i]` at lane `sel[i]` for
    valid slots; every other lane gets `fill`.

    values: (cap, ...) rows. Padding slots scatter into a dropped dummy row
    so they can never corrupt a real lane.
    """
    cap = sel.shape[0]
    out_shape = (n + 1,) + values.shape[1:]
    dest = jnp.full(out_shape, fill, dtype=values.dtype)
    idx = jnp.where(sel_valid, sel, n)
    return dest.at[idx].set(values, mode="drop")[:n]


def scatter_update(x: jnp.ndarray, sel: jnp.ndarray, sel_valid: jnp.ndarray,
                   values: jnp.ndarray) -> jnp.ndarray:
    """Like scatter_back but unselected lanes KEEP their value from `x`
    (read-modify-write; padding slots write a dropped dummy row)."""
    n = x.shape[0]
    idx = jnp.where(sel_valid, sel, n)
    padded = jnp.concatenate([x, x[-1:]], axis=0)
    return padded.at[idx].set(values, mode="drop")[:n]
