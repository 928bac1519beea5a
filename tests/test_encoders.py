"""Unit tests for MRHE and one-blob encoders: hash golden values, resolution
schedule, trilinear weights, gradient parity with autodiff, quirk flags."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralradiancecaching_tpu.config import (MRHEConfig, OneBlobConfig,
                                              QuirkFlags)
from neuralradiancecaching_tpu.ops import mrhe, oneblob

FIXED = QuirkFlags()


def test_resolution_schedule_matches_reference():
    # MRHE.cpp:111-121 with L=16, 16..512: geometric, truncated to uint
    cfg = MRHEConfig()
    res = mrhe.resolutions(cfg)
    assert res[0] == 16
    assert res[-1] == 512
    b = math.exp((math.log(512) - math.log(16)) / 15)
    expected = [int(16 * b ** i) for i in range(16)]
    np.testing.assert_array_equal(res, expected)
    # strictly increasing
    assert np.all(np.diff(res) > 0)


def test_hash_golden_values():
    # hand-computed: (x*1 + y*19349663 + z*83492791) mod 16384
    coords = jnp.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
                        [5, 7, 11]], dtype=jnp.int32)
    got = np.asarray(mrhe.hash_coords(coords, 16384))
    exp = [(x * 1 + y * 19349663 + z * 83492791) % 16384
           for x, y, z in np.asarray(coords)]
    np.testing.assert_array_equal(got, exp)


def test_hash_negative_coords_wrap_like_uint32():
    coords = jnp.array([[-1, -2, -3]], dtype=jnp.int32)
    got = int(mrhe.hash_coords(coords, 16384)[0])
    exp = (((-1) * 1 + (-2) * 19349663 + (-3) * 83492791) % (2 ** 32)) % 16384
    assert got == exp


def test_encode_trilerp_exact_on_small_table():
    """With a table small enough to be collision-free at level 0, the encode
    must reproduce hand-computed trilinear interpolation."""
    cfg = MRHEConfig(n_levels=1, table_size=16384, n_features=2,
                     min_res=2, max_res=2)
    key = jax.random.PRNGKey(0)
    table = mrhe.init_table(key, cfg)
    pos = jnp.array([[0.25, 0.4, 0.6]])  # resPos = (0.5, 0.8, 1.2)
    out = mrhe.encode(table, pos, cfg, FIXED)

    # hand trilinear: floor=(0,0,1), frac=(0.5,0.8,0.2)
    def h(x, y, z):
        return (x + y * 19349663 + z * 83492791) % 16384

    frac = np.array([0.5, 0.8, 0.2])
    acc = np.zeros(2)
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                w = ((frac[0] if cx else 1 - frac[0])
                     * (frac[1] if cy else 1 - frac[1])
                     * (frac[2] if cz else 1 - frac[2]))
                acc += w * np.asarray(table[0, h(cx, cy, 1 + cz)])
    np.testing.assert_allclose(np.asarray(out[0]), acc, rtol=1e-5)


def test_encode_grad_matches_autodiff():
    """The custom VJP's scatter-add must equal jax.grad of a pure-jnp
    re-implementation (gather + weighted sum, no custom_vjp)."""
    cfg = MRHEConfig(n_levels=4, table_size=64, n_features=2,
                     min_res=2, max_res=8)
    key = jax.random.PRNGKey(1)
    table = mrhe.init_table(key, cfg)
    pos = jax.random.uniform(jax.random.PRNGKey(2), (32, 3))

    def loss_custom(t):
        return jnp.sum(jnp.sin(mrhe.encode(t, pos, cfg, FIXED)))

    def loss_plain(t):
        flat_idx, weights = mrhe._encode_prep(pos, cfg, FIXED, None)
        gathered = jnp.take(t.reshape(-1, cfg.n_features), flat_idx, axis=0)
        feats = jnp.sum(weights[..., None] * gathered, axis=-2)
        return jnp.sum(jnp.sin(feats.reshape(pos.shape[0], -1)))

    g1 = jax.grad(loss_custom)(table)
    g2 = jax.grad(loss_plain)(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-6)


def test_encode_grad_finite_differences():
    cfg = MRHEConfig(n_levels=2, table_size=32, n_features=2,
                     min_res=2, max_res=4)
    table = mrhe.init_table(jax.random.PRNGKey(3), cfg)
    pos = jnp.array([[0.3, 0.7, 0.1], [0.9, 0.2, 0.5]])

    def loss(t):
        return jnp.sum(mrhe.encode(t, pos, cfg, FIXED) ** 2)

    g = jax.grad(loss)(table)
    eps = 1e-3
    # probe a few entries
    rng = np.random.default_rng(0)
    for _ in range(5):
        l = rng.integers(0, cfg.n_levels)
        e = rng.integers(0, cfg.table_size)
        f = rng.integers(0, cfg.n_features)
        tp = table.at[l, e, f].add(eps)
        tm = table.at[l, e, f].add(-eps)
        fd = (loss(tp) - loss(tm)) / (2 * eps)
        np.testing.assert_allclose(float(g[l, e, f]), float(fd),
                                   rtol=1e-2, atol=1e-4)


def test_duplicated_feature_grad_quirk():
    """Quirk #3: feature-0's error drives both features' table gradients."""
    quirk = QuirkFlags(duplicated_feature_grad=True)
    cfg = MRHEConfig(n_levels=1, table_size=16, n_features=2,
                     min_res=2, max_res=2)
    table = mrhe.init_table(jax.random.PRNGKey(4), cfg)
    pos = jnp.array([[0.3, 0.3, 0.3]])

    # loss reads only feature 1 => err = (0, c). With the quirk the backward
    # uses (0, 0) so the table grad must be identically zero.
    def loss(t, q):
        return jnp.sum(mrhe.encode(t, pos, cfg, q)[..., 1])

    g_quirk = jax.grad(lambda t: loss(t, quirk))(table)
    g_fixed = jax.grad(lambda t: loss(t, FIXED))(table)
    assert float(jnp.abs(g_quirk).sum()) == 0.0
    assert float(jnp.abs(g_fixed).sum()) > 0.0


def test_normalize_pos():
    p = mrhe.normalize_pos(jnp.array([0.0, 0.0, 0.0]),
                           (62.5, 42.5, 76.5), (0.0, 0.0, 0.0))
    np.testing.assert_allclose(np.asarray(p), [0.5, 0.5, 0.5])
    p = mrhe.normalize_pos(jnp.array([31.25, -21.25, 38.25]),
                           (62.5, 42.5, 76.5), (0.0, 0.0, 0.0))
    np.testing.assert_allclose(np.asarray(p), [1.0, 0.0, 1.0])


# ---------------------------------------------------------------------------
# one-blob
# ---------------------------------------------------------------------------

def test_norm_gauss_golden():
    # N(0; 0, 1) = 1/sqrt(2 pi)
    v = float(oneblob.norm_gauss(jnp.array(0.0), jnp.array(0.0), 1.0))
    assert v == pytest.approx(1.0 / math.sqrt(2 * math.pi), rel=1e-6)


def test_oneblob_raw_matches_reference_formula():
    quirk = QuirkFlags(raw_oneblob=True)
    cfg = OneBlobConfig()
    d = jnp.array([1.0, 0.0, 0.0])  # theta = atan2(0,1)/pi+.5 = 0.5
    feats = np.asarray(oneblob.encode_dir(d, cfg, quirk))
    assert feats.shape == (32,)
    # reference formula: feature[i] = NormGauss(i, 0.5, 0.25)
    exp0 = (1 / (0.25 * math.sqrt(2 * math.pi))) * math.exp(-0.5 * (0.5 / 0.25) ** 2)
    assert feats[0] == pytest.approx(exp0, rel=1e-5)
    # bins >= 2 essentially zero (the reference quirk)
    assert np.all(feats[2:16] < 1e-6)
    # phi = atan2(1, 0)/pi + 0.5 = 1.0 in the raw mapping
    exp16 = (1 / (0.25 * math.sqrt(2 * math.pi))) * math.exp(-0.5 * (1.0 / 0.25) ** 2)
    assert feats[16] == pytest.approx(exp16, rel=1e-5)


def test_oneblob_fixed_spreads_support():
    cfg = OneBlobConfig()
    d = jnp.array([0.0, 0.0, 1.0])  # theta = atan2(1,0)/pi+.5 = 1.0
    feats = np.asarray(oneblob.encode_dir(d, cfg, FIXED))
    # blob centered at bin 16 (theta=1 -> mean 16): strongest at last bins
    assert feats[:16].argmax() == 15
    # multiple bins active
    assert (feats[:16] > 1e-3).sum() >= 4


def test_oneblob_fixed_phi_range():
    cfg = OneBlobConfig()
    # up direction: phi = atan2(0, 1)/pi = 0 -> blob at bin 0
    feats = np.asarray(oneblob.encode_dir(jnp.array([0.0, 1.0, 0.0]),
                                          cfg, FIXED))
    assert feats[16:].argmax() == 0
    # down direction: phi = 1 -> blob at last bin
    feats = np.asarray(oneblob.encode_dir(jnp.array([0.0, -1.0, 0.0]),
                                          cfg, FIXED))
    assert feats[16:].argmax() == 15


def test_oneblob_batched_shape():
    cfg = OneBlobConfig()
    dirs = jax.random.normal(jax.random.PRNGKey(0), (4, 5, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    feats = oneblob.encode_dir(dirs, cfg, FIXED)
    assert feats.shape == (4, 5, 32)
    assert bool(jnp.all(jnp.isfinite(feats)))


def test_baked_encode_matches_hash_encode():
    """Dense-baked low-res levels must reproduce the hash-path encode
    exactly for in-range positions."""
    import jax
    from neuralradiancecaching_tpu.ops.mrhe import (bake_dense,
                                                    dense_level_count,
                                                    encode_with_baked)
    cfg = MRHEConfig()  # 16 levels, 16..512 -> 7 dense levels at <=64
    assert dense_level_count(cfg) == 7
    table = mrhe.init_table(jax.random.PRNGKey(5), cfg)
    baked = bake_dense(table, cfg)
    pos = jax.random.uniform(jax.random.PRNGKey(6), (128, 3))
    a = mrhe.encode(table, pos, cfg, FIXED)
    b = encode_with_baked(table, baked, pos, cfg, FIXED)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)


def test_baked_encode_boundary_positions():
    import jax
    from neuralradiancecaching_tpu.ops.mrhe import bake_dense, encode_with_baked
    cfg = MRHEConfig(n_levels=3, min_res=4, max_res=16, table_size=512)
    table = mrhe.init_table(jax.random.PRNGKey(7), cfg)
    baked = bake_dense(table, cfg)
    pos = jnp.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [0.5, 1.0, 0.0]])
    a = mrhe.encode(table, pos, cfg, FIXED)
    b = encode_with_baked(table, baked, pos, cfg, FIXED)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)


def test_oct_encode_bit_exact_everywhere():
    """Oct-packed rows (one gather per level) must reproduce the hash-path
    encode BIT-EXACTLY, including out-of-box positions (the hash wraps
    identically: corner hashes sit at constant mod-T offsets)."""
    from neuralradiancecaching_tpu.ops.mrhe import bake_oct, encode_with_oct
    cfg = MRHEConfig()
    table = mrhe.init_table(jax.random.PRNGKey(11), cfg)
    oct_rows = bake_oct(table, cfg)
    assert oct_rows.shape == (cfg.n_levels * cfg.table_size,
                              8 * cfg.n_features)
    pos = jax.random.uniform(jax.random.PRNGKey(12), (256, 3),
                             minval=-0.3, maxval=1.3)
    a = np.asarray(mrhe.encode(table, pos, cfg, FIXED))
    b = np.asarray(encode_with_oct(oct_rows, pos, cfg, FIXED))
    np.testing.assert_array_equal(a, b)


def test_oct_encode_2d_and_boundary():
    from neuralradiancecaching_tpu.ops.mrhe import bake_oct, encode_with_oct
    cfg = MRHEConfig(n_levels=3, min_res=4, max_res=16, table_size=512,
                     n_dims=2)
    table = mrhe.init_table(jax.random.PRNGKey(13), cfg)
    oct_rows = bake_oct(table, cfg)
    assert oct_rows.shape == (3 * 512, 4 * cfg.n_features)
    pos = jnp.array([[0.0, 0.0], [1.0, 1.0], [0.5, 1.0], [0.999, 0.001]])
    a = np.asarray(mrhe.encode(table, pos, cfg, FIXED))
    b = np.asarray(encode_with_oct(oct_rows, pos, cfg, FIXED))
    np.testing.assert_array_equal(a, b)


def test_oct_encode_world_space_lerp_quirk():
    """The oct path supports the world_space_lerp quirk (the r2 dense path
    had to bail to the hash encode)."""
    from neuralradiancecaching_tpu.ops.mrhe import bake_oct, encode_with_oct
    quirks = QuirkFlags(world_space_lerp=True)
    cfg = MRHEConfig(n_levels=4, min_res=4, max_res=32, table_size=1024)
    table = mrhe.init_table(jax.random.PRNGKey(14), cfg)
    oct_rows = bake_oct(table, cfg)
    pos_norm = jax.random.uniform(jax.random.PRNGKey(15), (64, 3))
    pos_raw = pos_norm * 60.0 - 30.0
    a = np.asarray(mrhe.encode(table, pos_norm, cfg, quirks,
                               pos_raw=pos_raw))
    b = np.asarray(encode_with_oct(oct_rows, pos_norm, cfg, quirks,
                                   pos_raw=pos_raw))
    np.testing.assert_array_equal(a, b)


def test_oct_requires_pow2_table():
    with pytest.raises(ValueError):
        MRHEConfig(table_size=1000, inference_bake="oct")
    cfg = MRHEConfig(table_size=1000, inference_bake="dense")
    assert not mrhe.oct_supported(cfg)


def test_query_baked_oct_matches_query():
    """nrc.query_baked (oct mode) == nrc.query on random rays."""
    from neuralradiancecaching_tpu import config as cfg_mod
    from neuralradiancecaching_tpu.models import nrc
    cfg = cfg_mod.nrc_online_config()
    state = nrc.init_state(jax.random.PRNGKey(16), cfg)
    assert cfg.mrhe.inference_bake == "oct"
    baked = nrc.bake(state, cfg)
    key = jax.random.PRNGKey(17)
    half = jnp.asarray(cfg.volume.box_size) * 0.5
    pos = (jax.random.uniform(key, (64, 3)) * 2 - 1) * half
    d = jax.random.normal(jax.random.fold_in(key, 1), (64, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    a = np.asarray(nrc.query(state, pos, d, cfg))
    b = np.asarray(nrc.query_baked(state, baked, pos, d, cfg))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)


def test_encode_oct_train_matches_hash_path():
    """encode_oct_train (one corner-packed row gather/level, oct-layout
    backward): forward bit-exact vs encode; gradients equal up to fp add
    order -- including the duplicated_feature_grad quirk and out-of-box
    positions."""
    from neuralradiancecaching_tpu.ops.mrhe import encode_oct_train

    cfg = MRHEConfig(n_levels=4, table_size=512, min_res=4, max_res=32)
    table = mrhe.init_table(jax.random.PRNGKey(0), cfg)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (257, 3),
                             minval=-0.2, maxval=1.2)

    f_hash = mrhe.encode(table, pos, cfg, FIXED)
    f_oct = encode_oct_train(table, pos, cfg, FIXED)
    np.testing.assert_array_equal(np.asarray(f_hash), np.asarray(f_oct))

    for quirks in (FIXED, QuirkFlags(duplicated_feature_grad=True)):
        def loss_h(t):
            return jnp.sum(jnp.sin(mrhe.encode(t, pos, cfg, quirks)) * 1.7)

        def loss_o(t):
            return jnp.sum(jnp.sin(encode_oct_train(t, pos, cfg, quirks))
                           * 1.7)

        gh = np.asarray(jax.grad(loss_h)(table))
        go = np.asarray(jax.grad(loss_o)(table))
        scale = max(np.abs(gh).max(), 1e-12)
        np.testing.assert_allclose(go, gh, atol=2e-5 * scale)
