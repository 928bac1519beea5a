"""ops/compact.py: O(n) cumsum compaction vs the argsort contract."""

import jax
import jax.numpy as jnp
import numpy as np

from neuralradiancecaching_tpu.ops import compact


def test_select_matches_argsort_prefix():
    key = jax.random.PRNGKey(0)
    mask = jax.random.uniform(key, (257,)) < 0.3
    cap = 128
    sel, sel_valid = compact.compact_select(mask, cap)
    ref = np.nonzero(np.asarray(mask))[0]
    k = min(len(ref), cap)
    np.testing.assert_array_equal(np.asarray(sel[:k]), ref[:k])
    assert int(sel_valid.sum()) == k


def test_select_overflow_drops_highest_lanes():
    mask = jnp.ones((10,), bool)
    sel, sel_valid = compact.compact_select(mask, 4)
    np.testing.assert_array_equal(np.asarray(sel), [0, 1, 2, 3])
    assert bool(sel_valid.all())


def test_select_empty_mask():
    mask = jnp.zeros((16,), bool)
    sel, sel_valid = compact.compact_select(mask, 8)
    assert not bool(sel_valid.any())


def test_scatter_back_round_trip():
    key = jax.random.PRNGKey(1)
    mask = jax.random.uniform(key, (100,)) < 0.4
    vals_full = jax.random.normal(jax.random.PRNGKey(2), (100, 3))
    cap = 64
    sel, sel_valid = compact.compact_select(mask, cap)
    packed = jnp.take(vals_full, sel, axis=0)
    out = compact.scatter_back(100, sel, sel_valid, packed, 0.0)
    expect = np.where(np.asarray(mask)[:, None], np.asarray(vals_full), 0.0)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-6)


def test_gather_back_matches_scatter_back():
    """inverse_select + gather_back == scatter_back for any mask/cap,
    including overflow (count > cap) and padding (count < cap): the
    gather formulation is the pose-static un-pack of the live-ray
    pipeline, so it must be value-identical."""
    for seed, cap, p in [(1, 64, 0.4), (3, 16, 0.9), (4, 48, 0.05)]:
        mask = jax.random.uniform(jax.random.PRNGKey(seed), (100,)) < p
        vals_full = jax.random.normal(jax.random.PRNGKey(seed + 10),
                                      (100, 4))
        sel, sel_valid = compact.compact_select(mask, cap)
        packed = jnp.take(vals_full, sel, axis=0)
        ref = compact.scatter_back(100, sel, sel_valid, packed, -2.0)
        inv = compact.inverse_select(100, sel, sel_valid)
        out = compact.gather_back(inv, packed, -2.0)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # per-channel fill row (the fused rgb+trans un-pack: fill 0,0,0,1)
    mask = jnp.array([False, True, False, True])
    sel, sel_valid = compact.compact_select(mask, 2)
    inv = compact.inverse_select(4, sel, sel_valid)
    vals = jnp.full((2, 4), 7.0)
    out = compact.gather_back(inv, vals,
                              jnp.asarray([0.0, 0.0, 0.0, 1.0]))
    np.testing.assert_array_equal(
        np.asarray(out), [[0, 0, 0, 1], [7, 7, 7, 7],
                          [0, 0, 0, 1], [7, 7, 7, 7]])


def test_scatter_back_padding_never_corrupts():
    # count < cap: the padding slots (sel index 0) must not write lane 0
    mask = jnp.array([False, True, False, False])
    sel, sel_valid = compact.compact_select(mask, 4)
    vals = jnp.full((4, 2), 7.0)
    out = compact.scatter_back(4, sel, sel_valid, vals, -1.0)
    np.testing.assert_array_equal(
        np.asarray(out), [[-1, -1], [7, 7], [-1, -1], [-1, -1]])


def test_select_jit_and_scalar_rows():
    f = jax.jit(lambda m: compact.compact_select(m, 8))
    mask = jnp.array([True] * 3 + [False] * 13)
    sel, sel_valid = f(mask)
    np.testing.assert_array_equal(np.asarray(sel[:3]), [0, 1, 2])
    packed = jnp.take(jnp.arange(16.0), sel)
    out = compact.scatter_back(16, sel, sel_valid, packed, 1.0)
    np.testing.assert_array_equal(np.asarray(out)[:4], [0, 1, 2, 1.0])


def test_compact_prefix_matches_reference():
    counts = jnp.array([2, 0, 3, 1, 0, 4])
    row, slot, valid = compact.compact_prefix(counts, 16)
    exp_row = [0, 0, 2, 2, 2, 3, 5, 5, 5, 5]
    exp_slot = [0, 1, 0, 1, 2, 0, 0, 1, 2, 3]
    np.testing.assert_array_equal(np.asarray(row[:10]), exp_row)
    np.testing.assert_array_equal(np.asarray(slot[:10]), exp_slot)
    assert int(valid.sum()) == 10
    assert not bool(valid[10:].any())


def test_compact_prefix_overflow_drops_tail_rows():
    counts = jnp.array([3, 3, 3])
    row, slot, valid = compact.compact_prefix(counts, 5)
    assert bool(valid.all())
    np.testing.assert_array_equal(np.asarray(row), [0, 0, 0, 1, 1])
    np.testing.assert_array_equal(np.asarray(slot), [0, 1, 2, 0, 1])


def test_compact_prefix_empty():
    row, slot, valid = compact.compact_prefix(jnp.zeros(8, jnp.int32), 4)
    assert not bool(valid.any())


def test_compact_prefix_jit_segment_sum_round_trip():
    key = jax.random.PRNGKey(3)
    n, k = 50, 6
    counts = jax.random.randint(key, (n,), 0, k + 1)
    vals = jax.random.normal(jax.random.PRNGKey(4), (n, k))
    # zero out non-prefix slots
    pref = jnp.arange(k)[None, :] < counts[:, None]
    vals = jnp.where(pref, vals, 0.0)
    cap = n * k
    row, slot, valid = jax.jit(
        lambda c: compact.compact_prefix(c, cap))(counts)
    idx = row * k + jnp.minimum(slot, k - 1)
    picked = jnp.take(vals.reshape(-1), idx)
    picked = jnp.where(valid, picked, 0.0)
    seg = jnp.where(valid, row, n)
    out = jax.ops.segment_sum(picked, seg, num_segments=n + 1,
                              indices_are_sorted=True)[:n]
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(vals.sum(axis=1)), rtol=1e-5)


def test_prefix_segment_sum_matches_segment_sum():
    key = jax.random.PRNGKey(7)
    n, k = 64, 5
    counts = jax.random.randint(key, (n,), 0, k + 1)
    vals = jax.random.normal(jax.random.PRNGKey(8), (n, k, 3))
    pref = (jnp.arange(k)[None, :] < counts[:, None])[..., None]
    vals = jnp.where(pref, vals, 0.0)
    for cap in (n * k, 17):  # ample and truncating caps
        row, slot, valid = compact.compact_prefix(counts, cap)
        idx = row * k + jnp.minimum(slot, k - 1)
        picked = jnp.take(vals.reshape(n * k, 3), idx, axis=0)
        picked = jnp.where(valid[:, None], picked, 0.0)
        seg = jnp.where(valid, row, n)
        ref = jax.ops.segment_sum(picked, seg, num_segments=n + 1,
                                  indices_are_sorted=True)[:n]
        out = jax.jit(compact.prefix_segment_sum)(picked, counts, slot)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)


def test_prefix_segment_sum_empty_and_1d():
    counts = jnp.zeros(8, jnp.int32)
    row, slot, valid = compact.compact_prefix(counts, 4)
    out = compact.prefix_segment_sum(jnp.zeros(4), counts, slot)
    assert out.shape == (8,)
    np.testing.assert_array_equal(np.asarray(out), np.zeros(8))
