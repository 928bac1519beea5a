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
