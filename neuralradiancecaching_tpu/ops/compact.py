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


def inverse_select(n: int, sel: jnp.ndarray, sel_valid: jnp.ndarray
                   ) -> jnp.ndarray:
    """Precompute the inverse index map of a compact_select: inv[lane] =
    packed slot holding that lane, or `cap` (sentinel) for unselected
    lanes. Enables :func:`gather_back` -- when `sel` is static across many
    frames (the pose-static live-ray pack), the per-frame un-pack becomes
    ONE gather instead of per-array scatters (TPU scatters cost ~5x a
    same-size gather, docs/PERFORMANCE.md compaction section)."""
    cap = sel.shape[0]
    idx = jnp.where(sel_valid, sel, n)
    inv = jnp.full((n + 1,), cap, jnp.int32).at[idx].set(
        jnp.arange(cap, dtype=jnp.int32), mode="drop")[:n]
    return inv


def gather_back(inv: jnp.ndarray, values: jnp.ndarray, fill) -> jnp.ndarray:
    """scatter_back via a precomputed :func:`inverse_select` map: one
    gather, no scatter. Lane i gets values[inv[i]]; sentinel lanes get
    `fill`. Identical output to scatter_back(n, sel, sel_valid, values,
    fill) for the (sel, sel_valid) that built `inv`."""
    fill_row = jnp.full((1,) + values.shape[1:], fill, values.dtype)
    padded = jnp.concatenate([values, fill_row], axis=0)
    return jnp.take(padded, inv, axis=0)


def compact_prefix(counts: jnp.ndarray, cap: int
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pack per-row PREFIX runs contiguously: row i contributes its slots
    0..counts[i]-1, rows in order.

    This is the fast path for collision-walk events, whose validity is
    prefix-shaped by construction (a done lane never revives): instead of
    an n*k-element scatter (compact_select) plus a random-order scatter-add
    on the way back, the pack needs one cumsum over rows, ONE n-element
    mark scatter, one cumsum over the cap -- and the packed rows come out
    SORTED by row, so the un-pack reduction is a segmented scan
    (:func:`prefix_segment_sum`).
    (Measured: the compact_select pack at 12.4M slots costs ~800 ms on
    v5e; this path is ~10x cheaper.)

    counts: (n,) int32. Returns (row (cap,), slot (cap,), valid (cap,)):
    packed position p holds row[p]'s slot[p]; positions beyond
    min(sum(counts), cap) have valid False. Overflow (sum > cap) drops the
    HIGHEST row indices (bottom of a frame), deterministically.
    """
    n = counts.shape[0]
    counts = counts.astype(jnp.int32)
    cum = jnp.cumsum(counts)
    offs = cum - counts                                  # exclusive
    total = cum[-1]
    # mark each nonempty row's id at its start position (starts are
    # strictly increasing, so no in-bounds duplicates), then a cumulative
    # max fills every packed position with its owning row id
    import jax

    start = jnp.where((counts > 0) & (offs < cap), offs, cap)
    rowmark = jnp.full((cap + 1,), -1, jnp.int32).at[start].max(
        jnp.arange(n, dtype=jnp.int32), mode="drop")[:cap]
    row = jnp.clip(jax.lax.cummax(rowmark), 0, n - 1)    # (cap,) sorted
    p = jnp.arange(cap, dtype=jnp.int32)
    slot = p - jnp.take(offs, row)
    valid = p < jnp.minimum(total, cap)
    return row, slot, valid


def prefix_segment_sum(contrib: jnp.ndarray, counts: jnp.ndarray,
                       slot: jnp.ndarray) -> jnp.ndarray:
    """Per-row sums of prefix-packed contributions, without a scatter.

    Replaces ``segment_sum(contrib, row, indices_are_sorted=True)`` for
    packs built by :func:`compact_prefix`: a segmented associative scan
    (flags reset at ``slot == 0`` segment starts) followed by one gather of
    each row's last lane. Measured ~3x cheaper than the sorted segment_sum
    at 1080p event scale (32.9 -> 10.3 ms at 680k lanes,
    docs/PERFORMANCE.md); the scan resets per segment so fp32 error does
    not accumulate across the frame the way a raw-cumsum boundary diff
    would.

    contrib: (cap, ...) packed values in compact_prefix lane order, with
    invalid (padding) lanes already zeroed. counts: (n,) the per-row lane
    counts that built the pack. slot: (cap,) within-row slot ids from
    compact_prefix. Returns (n, ...) per-row sums; rows fully beyond the
    cap (or with zero lanes) get 0. Matches the segment_sum drop semantics
    exactly, including partial sums for the row truncated at the cap.
    """
    import jax

    cap = contrib.shape[0]
    cum = jnp.cumsum(counts.astype(jnp.int32))
    offs = cum - counts
    tail = (1,) * (contrib.ndim - 1)
    flags = jnp.broadcast_to((slot == 0).reshape((cap,) + tail),
                             contrib.shape)

    def seg_op(a, b):
        va, fa = a
        vb, fb = b
        return jnp.where(fb, vb, va + vb), fa | fb

    vals, _ = jax.lax.associative_scan(seg_op, (contrib, flags))
    idx = jnp.clip(jnp.minimum(cum, cap) - 1, 0, cap - 1)
    out = jnp.take(vals, idx, axis=0)
    keep = (counts > 0) & (offs < cap)
    return jnp.where(keep.reshape((-1,) + tail), out,
                     jnp.zeros((), contrib.dtype))


def scatter_update(x: jnp.ndarray, sel: jnp.ndarray, sel_valid: jnp.ndarray,
                   values: jnp.ndarray) -> jnp.ndarray:
    """Like scatter_back but unselected lanes KEEP their value from `x`
    (read-modify-write; padding slots write a dropped dummy row)."""
    n = x.shape[0]
    idx = jnp.where(sel_valid, sel, n)
    padded = jnp.concatenate([x, x[-1:]], axis=0)
    return padded.at[idx].set(values, mode="drop")[:n]
