"""Multiresolution hash encoding (Instant-NGP style MRHE).

Reference: hash function (x*1 + y*19349663 + z*83492791) mod T
(nrc-train.comp:254-260), geometric resolution schedule 16->512 over 16
levels (MRHE.cpp:111-121), 2 features per entry trilinearly interpolated from
the 8 cell corners (nrc-train.comp:266-339), gradients scatter-accumulated
into a delta table with trilinear weights (BackpropMrhe, :947-983).

TPU-native design: the per-thread 16x8 hash gathers become one batched
``jnp.take`` over a (L*T, F) table -- XLA lowers this to a vectorized TPU
gather. The reference's float-atomicAdd gradient accumulation becomes the
gather's transpose, a scatter-add, expressed through a ``custom_vjp`` so the
backward can (a) reproduce quirk #3 (feature-0's error applied to both
features) on demand and (b) later be swapped for a sort+segment-sum Pallas
kernel without touching callers.

Works for n_dims=3 (volume positions) and n_dims=2 (image fit).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from neuralradiancecaching_tpu.config import MRHEConfig, QuirkFlags

# hash primes (nrc-train.comp:256); first prime 1 keeps x-adjacency linear
HASH_PRIMES = (1, 19349663, 83492791)


def resolutions(cfg: MRHEConfig) -> np.ndarray:
    """Geometric level resolutions (MRHE.cpp:111-121): N_l = Nmin * b^l,
    b = exp((ln Nmax - ln Nmin)/(L-1)), truncated to uint32."""
    if cfg.n_levels == 1:
        b = 1.0
    else:
        b = math.exp((math.log(cfg.max_res) - math.log(cfg.min_res))
                     / (cfg.n_levels - 1))
    res = [int(cfg.min_res * (b ** i)) for i in range(cfg.n_levels)]
    return np.asarray(res, dtype=np.int32)


def init_table(key: jax.Array, cfg: MRHEConfig,
               dtype=jnp.float32) -> jnp.ndarray:
    """(L, T, F) table, init N(0,1)*init_std (MRHE.cpp:127-144)."""
    return (
        jax.random.normal(key, (cfg.n_levels, cfg.table_size, cfg.n_features),
                          dtype=dtype)
        * cfg.init_std
    )


def _corner_offsets(n_dims: int) -> np.ndarray:
    """(2^D, D) binary corner offsets, x-major like the reference's
    (x*4 + y*2 + z) linearization (nrc-train.comp:281-289)."""
    n = 1 << n_dims
    out = np.zeros((n, n_dims), dtype=np.int32)
    for i in range(n):
        for d in range(n_dims):
            out[i, d] = (i >> (n_dims - 1 - d)) & 1
    return out


def hash_coords(coords: jnp.ndarray, table_size: int) -> jnp.ndarray:
    """Spatial hash of integer grid coords (..., D) -> (...,) in [0, T).

    uint32 wraparound arithmetic matches the GLSL uvec math
    (nrc-train.comp:254-260); negative coords wrap exactly like the
    GLSL float->uint conversion of a floored value.
    """
    c = coords.astype(jnp.uint32)
    h = jnp.zeros(coords.shape[:-1], dtype=jnp.uint32)
    for d in range(coords.shape[-1]):
        h = h + c[..., d] * jnp.uint32(HASH_PRIMES[d])
    if table_size & (table_size - 1) == 0:
        return (h & jnp.uint32(table_size - 1)).astype(jnp.int32)
    return (h % jnp.uint32(table_size)).astype(jnp.int32)


def _encode_prep(pos_norm: jnp.ndarray, cfg: MRHEConfig,
                 quirks: QuirkFlags, pos_raw: jnp.ndarray | None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shared forward/backward geometry.

    Returns (flat_idx, weights):
      flat_idx: (..., L, 2^D) int32 indices into the (L*T,) flattened table
      weights:  (..., L, 2^D) trilinear interpolation weights
    """
    res = jnp.asarray(resolutions(cfg), dtype=pos_norm.dtype)  # (L,)
    x = pos_norm[..., None, :] * res[:, None]  # (..., L, D)
    x0 = jnp.floor(x)
    if quirks.world_space_lerp:
        # reference bug (nrc-train.comp:312): world pos minus grid corner
        assert pos_raw is not None
        frac = pos_raw[..., None, :] - x0
    else:
        frac = x - x0

    offsets = jnp.asarray(_corner_offsets(cfg.n_dims))  # (2^D, D)
    corners = x0[..., None, :].astype(jnp.int32) + offsets  # (..., L, 2^D, D)
    idx = hash_coords(corners, cfg.table_size)  # (..., L, 2^D)

    # per-corner weight: prod_d (offset_d ? frac_d : 1 - frac_d)
    w = jnp.where(offsets.astype(bool), frac[..., None, :],
                  1.0 - frac[..., None, :])  # (..., L, 2^D, D)
    weights = jnp.prod(w, axis=-1)

    level_base = (jnp.arange(cfg.n_levels, dtype=jnp.int32)
                  * cfg.table_size)[:, None]  # (L, 1)
    return idx + level_base, weights


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def encode(table: jnp.ndarray, pos_norm: jnp.ndarray, cfg: MRHEConfig,
           quirks: QuirkFlags, pos_raw: jnp.ndarray | None = None
           ) -> jnp.ndarray:
    """Encode normalized positions.

    Args:
      table: (L, T, F) hash tables.
      pos_norm: (..., D) positions, nominally in [0,1]^D.
      pos_raw: unnormalized world positions, only consulted by the
        ``world_space_lerp`` quirk.
    Returns:
      (..., L*F) features, level-major (mrheFeatures layout,
      nrc-train.comp:336-337).
    """
    out, _ = _encode_fwd(table, pos_norm, cfg, quirks, pos_raw)
    return out


def _encode_fwd(table, pos_norm, cfg, quirks, pos_raw):
    flat_idx, weights = _encode_prep(pos_norm, cfg, quirks, pos_raw)
    flat_table = table.reshape(-1, cfg.n_features)  # (L*T, F)
    gathered = jnp.take(flat_table, flat_idx, axis=0)  # (..., L, 2^D, F)
    feats = jnp.sum(weights[..., None] * gathered, axis=-2)  # (..., L, F)
    out = feats.reshape(*pos_norm.shape[:-1], cfg.n_levels * cfg.n_features)
    return out, (flat_idx, weights, pos_norm.shape)


def _encode_bwd(cfg, quirks, residuals, g):
    flat_idx, weights, pos_shape = residuals
    err = g.reshape(*pos_shape[:-1], cfg.n_levels, cfg.n_features)
    if quirks.duplicated_feature_grad:
        # reference bug (nrc-train.comp:960): feature 0's error drives
        # every feature's table gradient
        err = jnp.broadcast_to(err[..., :1], err.shape)
    # scatter-add: d table[idx] += w * err  -- the TPU-native replacement for
    # the reference's float atomicAdd into mrDeltaHashTable
    contrib = weights[..., None] * err[..., None, :]  # (..., L, 2^D, F)
    flat = jnp.zeros((cfg.n_levels * cfg.table_size, cfg.n_features),
                     dtype=contrib.dtype)
    flat = flat.at[flat_idx.reshape(-1)].add(
        contrib.reshape(-1, cfg.n_features))
    d_table = flat.reshape(cfg.n_levels, cfg.table_size, cfg.n_features)
    # positions are not trained; raw-pos tangent likewise zero
    return d_table, None, None


encode.defvjp(_encode_fwd, _encode_bwd)


# ---------------------------------------------------------------------------
# Dense-baked low-resolution levels (inference fast path)
#
# The encode costs 8 hash-row gathers per level per query -- the single
# hottest kernel in the renderer (measured). For levels whose grid is small
# (res <= DENSE_MAX_RES) the hash table can be BAKED into a dense
# corner-packed grid after each optimizer step: one 8*F-float row gather
# then yields the whole trilinear patch, like the density corner table.
# Training always uses the pure hash path (gradients flow into the hash
# table); the bake is a cheap per-frame projection (~0.6M hash lookups).
# ---------------------------------------------------------------------------

DENSE_MAX_RES = 64  # legacy default; MRHEConfig.dense_max_res overrides


def dense_level_count(cfg: MRHEConfig) -> int:
    """Number of leading levels with resolution <= cfg.dense_max_res."""
    if cfg.n_dims != 3:
        return 0
    res = resolutions(cfg)
    return int(np.sum(res <= getattr(cfg, "dense_max_res", DENSE_MAX_RES)))


def dense_level_offsets(cfg: MRHEConfig):
    """(offsets, sizes) of each dense level's row block; rows are base cells
    in [0, res]^3 (covering resPos in [0, res] for pos_norm in [0,1])."""
    res = resolutions(cfg)
    n = dense_level_count(cfg)
    sizes = [(int(r) + 1) ** 3 for r in res[:n]]
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int32)
    return offsets, sizes


@partial(jax.jit, static_argnums=(1,))
def bake_dense(table: jnp.ndarray, cfg: MRHEConfig) -> jnp.ndarray:
    """(R_total, 8*F) corner-packed rows for all dense levels, concatenated.

    Row for base cell b of level l = the 8 corner feature vectors
    table[l, hash(b + offset)] in x-major corner order.
    """
    res = resolutions(cfg)
    n = dense_level_count(cfg)
    blocks = []
    for l in range(n):
        r = int(res[l])
        side = r + 2  # corner coords span [0, res+1]
        ax = jnp.arange(side, dtype=jnp.int32)
        cx, cy, cz = jnp.meshgrid(ax, ax, ax, indexing="ij")
        coords = jnp.stack([cx, cy, cz], axis=-1)  # (side,side,side,3)
        idx = hash_coords(coords, cfg.table_size)
        grid = jnp.take(table[l], idx.reshape(-1), axis=0).reshape(
            side, side, side, cfg.n_features)
        # pack the 8 corners per base cell (base in [0, res]^3)
        slices = []
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    slices.append(grid[dx:dx + r + 1, dy:dy + r + 1,
                                       dz:dz + r + 1])
        packed = jnp.concatenate(slices, axis=-1)  # (r+1,r+1,r+1, 8*F)
        blocks.append(packed.reshape(-1, 8 * cfg.n_features))
    if not blocks:
        return jnp.zeros((1, 8 * cfg.n_features), dtype=table.dtype)
    return jnp.concatenate(blocks, axis=0)


def encode_with_baked(table: jnp.ndarray, baked: jnp.ndarray,
                      pos_norm: jnp.ndarray, cfg: MRHEConfig,
                      quirks: QuirkFlags) -> jnp.ndarray:
    """Inference encode: dense levels from the baked rows (1 gather/level),
    remaining levels from the hash table (8 gathers/level). Numerically
    identical to :func:`encode` for in-range positions (tested)."""
    n_dense = dense_level_count(cfg)
    if n_dense == 0 or quirks.world_space_lerp:
        return encode(table, pos_norm, cfg, quirks, pos_raw=None)

    res_all = resolutions(cfg)
    offsets, _ = dense_level_offsets(cfg)
    flat_levels, w_levels = [], []
    for l in range(n_dense):
        r = int(res_all[l])
        x = pos_norm * r  # (..., 3)
        x0 = jnp.floor(x)
        frac = x - x0
        b = jnp.clip(x0.astype(jnp.int32), 0, r)  # base in [0, res]
        flat = (int(offsets[l]) + b[..., 0] * ((r + 1) * (r + 1))
                + b[..., 1] * (r + 1) + b[..., 2])
        fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
        gx, gy, gz = 1.0 - fx, 1.0 - fy, 1.0 - fz
        w = jnp.stack([gx * gy * gz, gx * gy * fz, gx * fy * gz,
                       gx * fy * fz, fx * gy * gz, fx * gy * fz,
                       fx * fy * gz, fx * fy * fz], axis=-1)
        flat_levels.append(flat)
        w_levels.append(w)

    # ONE gather for all dense levels (indices already carry the level
    # offsets); rows may be stored bf16 -- upcast after the gather
    flat_all = jnp.stack(flat_levels, axis=-1)          # (..., n_dense)
    rows = jnp.take(baked, flat_all, axis=0).astype(pos_norm.dtype)
    rows = rows.reshape(*rows.shape[:-1], 8, cfg.n_features)
    w_all = jnp.stack(w_levels, axis=-2)                # (..., n_dense, 8)
    feats = jnp.sum(rows * w_all[..., None], axis=-2)   # (..., n_dense, F)
    dense = feats.reshape(*pos_norm.shape[:-1], n_dense * cfg.n_features)
    if n_dense == cfg.n_levels:
        return dense

    # hashed tail levels through the standard path
    tail_cfg = MRHEConfig(
        n_levels=cfg.n_levels - n_dense, table_size=cfg.table_size,
        n_features=cfg.n_features, min_res=int(res_all[n_dense]),
        max_res=cfg.max_res, init_std=cfg.init_std,
        learning_rate=cfg.learning_rate, weight_decay=cfg.weight_decay,
        clip_border=cfg.clip_border, reset_border=cfg.reset_border,
        n_dims=cfg.n_dims)
    # NOTE: tail levels must use the ORIGINAL resolution schedule, not a
    # re-derived one -- pass them explicitly via the prep override below.
    tail = _encode_tail(table[n_dense:], pos_norm, res_all[n_dense:],
                        tail_cfg)
    return jnp.concatenate([dense, tail], axis=-1)


def _encode_tail(tables_tail: jnp.ndarray, pos_norm: jnp.ndarray,
                 res_tail, cfg_tail: MRHEConfig) -> jnp.ndarray:
    """Hash-path encode over an explicit resolution list (no grad path --
    inference only)."""
    res = jnp.asarray(np.asarray(res_tail, dtype=np.int32),
                      dtype=pos_norm.dtype)
    x = pos_norm[..., None, :] * res[:, None]
    x0 = jnp.floor(x)
    frac = x - x0
    offsets = jnp.asarray(_corner_offsets(cfg_tail.n_dims))
    corners = x0[..., None, :].astype(jnp.int32) + offsets
    idx = hash_coords(corners, cfg_tail.table_size)
    w = jnp.where(offsets.astype(bool), frac[..., None, :],
                  1.0 - frac[..., None, :])
    weights = jnp.prod(w, axis=-1)
    n_tail = len(res_tail)
    level_base = (jnp.arange(n_tail, dtype=jnp.int32)
                  * cfg_tail.table_size)[:, None]
    flat_idx = idx + level_base
    flat_table = tables_tail.reshape(-1, cfg_tail.n_features)
    gathered = jnp.take(flat_table, flat_idx,
                        axis=0).astype(pos_norm.dtype)
    feats = jnp.sum(weights[..., None] * gathered, axis=-2)
    return feats.reshape(*pos_norm.shape[:-1],
                         n_tail * cfg_tail.n_features)


# ---------------------------------------------------------------------------
# Oct-packed hash rows (inference fast path, r3)
#
# The spatial hash h(c) = sum_d c_d * prime_d (mod T) is LINEAR in the
# corner offsets: every cell corner's hash sits at a CONSTANT offset from
# the base corner's hash, h(base + off) = (h(base) + off . primes) mod T.
# With T a power of two, T divides 2^32, so the identity survives uint32
# wraparound exactly. Baking the table as (L*T, 2^D * F) rows -- row (l, h)
# holding the 2^D corner feature vectors [table[l, (h+const_c) mod T]] --
# turns the 8-gathers-per-level encode into ONE row gather per level for
# EVERY level (not just dense-bakeable low-res ones). The bake is 2^D
# jnp.rolls (~4 ms vs 39 ms for the r2 dense bake), and the result is
# bit-exact vs :func:`encode` for ALL positions including out-of-box
# (measured, scripts/profile_oct.py: 153.8 -> 34.8 ms per 393k queries).
#
# Replaces the fully-fused per-thread gather loop of the reference
# (nrc-forward.frag:254-330) with a layout trick instead of a kernel: the
# gather-op row count, not the FLOPs, was the measured query cost.
# ---------------------------------------------------------------------------


def corner_hash_offsets(cfg: MRHEConfig) -> np.ndarray:
    """(2^D,) hash offset of each cell corner from the base corner, mod T,
    in x-major corner order (matching :func:`_corner_offsets`)."""
    offs = _corner_offsets(cfg.n_dims).astype(np.uint64)  # (C, D)
    primes = np.asarray(HASH_PRIMES[:cfg.n_dims], dtype=np.uint64)
    return ((offs * primes).sum(-1)
            % np.uint64(cfg.table_size)).astype(np.int32)


def oct_supported(cfg: MRHEConfig) -> bool:
    """The constant-offset identity needs T | 2^32, i.e. power-of-two T."""
    t = cfg.table_size
    return t > 0 and (t & (t - 1)) == 0


@partial(jax.jit, static_argnums=(1,))
def bake_oct(table: jnp.ndarray, cfg: MRHEConfig) -> jnp.ndarray:
    """(L*T, 2^D * F) corner-packed hash rows (see module comment above)."""
    assert oct_supported(cfg), "oct bake requires a power-of-two table_size"
    parts = [jnp.roll(table, -int(o), axis=1)
             for o in corner_hash_offsets(cfg)]
    packed = jnp.concatenate(parts, axis=-1)  # (L, T, C*F)
    return packed.reshape(cfg.n_levels * cfg.table_size, -1)


def encode_with_oct(oct_rows: jnp.ndarray, pos_norm: jnp.ndarray,
                    cfg: MRHEConfig, quirks: QuirkFlags,
                    pos_raw: jnp.ndarray | None = None,
                    compute_dtype=None) -> jnp.ndarray:
    """Inference encode from oct-packed rows: one row gather per level.

    Bit-exact vs :func:`encode` when ``oct_rows`` keeps the table dtype;
    with bf16 rows the gathered features round to bf16 (the measured-fast
    configuration: 32 B rows gather ~3x faster than 64 B fp32 rows).

    compute_dtype: when set (bf16 inference, MLPConfig.inference_dtype),
    the lerp WEIGHTS and feature reduction run in that dtype and the
    output keeps it; the grid index math and lerp fractions always stay
    in pos_norm's dtype (f32) -- bf16 fractions would quantize fine-level
    interpolation. None (default): full f32, bit-compatible with before.
    """
    res = jnp.asarray(resolutions(cfg), dtype=pos_norm.dtype)
    x = pos_norm[..., None, :] * res[:, None]  # (..., L, D)
    x0 = jnp.floor(x)
    if quirks.world_space_lerp:
        # reference bug (nrc-train.comp:312): world pos minus grid corner
        assert pos_raw is not None
        frac = pos_raw[..., None, :] - x0
    else:
        frac = x - x0
    h = hash_coords(x0.astype(jnp.int32), cfg.table_size)  # (..., L)
    level_base = jnp.arange(cfg.n_levels, dtype=jnp.int32) * cfg.table_size
    cd = compute_dtype if compute_dtype is not None else pos_norm.dtype
    rows = jnp.take(oct_rows, h + level_base, axis=0).astype(cd)
    frac = frac.astype(cd)
    c = 1 << cfg.n_dims
    rows = rows.reshape(*rows.shape[:-1], c, cfg.n_features)
    offsets = jnp.asarray(_corner_offsets(cfg.n_dims))  # (C, D)
    w = jnp.where(offsets.astype(bool), frac[..., None, :],
                  jnp.asarray(1.0, cd) - frac[..., None, :])
    weights = jnp.prod(w, axis=-1)  # (..., L, C)
    feats = jnp.sum(rows * weights[..., None], axis=-2)  # (..., L, F)
    return feats.reshape(*pos_norm.shape[:-1],
                         cfg.n_levels * cfg.n_features)


# ---------------------------------------------------------------------------
# Oct-packed TRAIN encode (r4)
#
# The training forward/backward previously ran the pure hash path: 8 gather
# ops per level forward (128 ops at L=16 -- measured 17.5 ms at the 10k
# train batch; TPU gathers are op-count bound) and one 8x-row scatter-add
# backward (~18 ms). The same corner-linearity that powers the inference
# bake_oct applies to BOTH directions:
#   fwd: bake the (L*T, 2^D F) corner-packed rows (2^D rolls of a 2 MB
#        table, ~1 ms) and gather ONE row per level;
#   bwd: scatter-add (batch, L) rows of 2^D F corner contributions into the
#        OCT layout (2^D x fewer scatter rows), then fold back with the
#        INVERSE rolls: d_table[l, t] = sum_c roll(d_oct[..c..], +off_c).
# Gradients equal the hash path's exactly up to fp add order (the flat
# corner index (h_base + off_c) mod T IS _encode_prep's hash_coords value
# for power-of-two T -- the bake_oct identity). Requires oct_supported.
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def encode_oct_train(table: jnp.ndarray, pos_norm: jnp.ndarray,
                     cfg: MRHEConfig, quirks: QuirkFlags,
                     pos_raw: jnp.ndarray | None = None) -> jnp.ndarray:
    """Trainable encode via corner-packed rows (see block comment)."""
    out, _ = _encode_oct_fwd(table, pos_norm, cfg, quirks, pos_raw)
    return out


def _oct_geom(pos_norm, cfg, quirks, pos_raw):
    """(flat base-row idx (..., L), weights (..., L, 2^D))."""
    res = jnp.asarray(resolutions(cfg), dtype=pos_norm.dtype)
    x = pos_norm[..., None, :] * res[:, None]
    x0 = jnp.floor(x)
    if quirks.world_space_lerp:
        assert pos_raw is not None
        frac = pos_raw[..., None, :] - x0
    else:
        frac = x - x0
    h = hash_coords(x0.astype(jnp.int32), cfg.table_size)  # (..., L)
    level_base = jnp.arange(cfg.n_levels, dtype=jnp.int32) * cfg.table_size
    offsets = jnp.asarray(_corner_offsets(cfg.n_dims))  # (C, D)
    w = jnp.where(offsets.astype(bool), frac[..., None, :],
                  1.0 - frac[..., None, :])
    weights = jnp.prod(w, axis=-1)  # (..., L, C)
    return h + level_base, weights


def _encode_oct_fwd(table, pos_norm, cfg, quirks, pos_raw):
    flat, weights = _oct_geom(pos_norm, cfg, quirks, pos_raw)
    packed = bake_oct(table, cfg)                    # (L*T, C*F)
    rows = jnp.take(packed, flat, axis=0)            # (..., L, C*F)
    c = 1 << cfg.n_dims
    rows = rows.reshape(*rows.shape[:-1], c, cfg.n_features)
    feats = jnp.sum(rows * weights[..., None], axis=-2)  # (..., L, F)
    out = feats.reshape(*pos_norm.shape[:-1],
                        cfg.n_levels * cfg.n_features)
    return out, (flat, weights, pos_norm.shape)


def _encode_oct_bwd(cfg, quirks, residuals, g):
    flat, weights, pos_shape = residuals
    c = 1 << cfg.n_dims
    err = g.reshape(*pos_shape[:-1], cfg.n_levels, cfg.n_features)
    if quirks.duplicated_feature_grad:
        # reference bug (nrc-train.comp:960): feature 0's error drives
        # every feature's table gradient
        err = jnp.broadcast_to(err[..., :1], err.shape)
    contrib = weights[..., None] * err[..., None, :]  # (..., L, C, F)
    d_oct = jnp.zeros((cfg.n_levels * cfg.table_size, c * cfg.n_features),
                      dtype=contrib.dtype)
    d_oct = d_oct.at[flat.reshape(-1)].add(
        contrib.reshape(-1, c * cfg.n_features))
    d_oct = d_oct.reshape(cfg.n_levels, cfg.table_size, c, cfg.n_features)
    # inverse rolls of bake_oct: packed[l, h, c] = table[l, (h+off_c) % T]
    # => d_table[l, t] = sum_c d_oct[l, (t - off_c) % T, c]
    d_table = jnp.zeros((cfg.n_levels, cfg.table_size, cfg.n_features),
                        dtype=contrib.dtype)
    for ci, off in enumerate(corner_hash_offsets(cfg)):
        d_table = d_table + jnp.roll(d_oct[:, :, ci, :], int(off), axis=1)
    return d_table, None, None


encode_oct_train.defvjp(_encode_oct_fwd, _encode_oct_bwd)


def normalize_pos(pos: jnp.ndarray, box_size, box_center) -> jnp.ndarray:
    """World position -> [0,1]^3 (EncodePosMrhe normPos, nrc-train.comp:268)."""
    size = jnp.asarray(box_size, dtype=pos.dtype)
    center = jnp.asarray(box_center, dtype=pos.dtype)
    return (pos - center) / size + 0.5
