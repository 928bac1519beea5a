"""Oct-table MRHE gather prototype: exploit the mod-T linearity of the
spatial hash (h(corner) = h(base) + const_c mod T, exact under uint32
wraparound because T | 2^32) to pack all 2^D corner rows of a cell into ONE
gathered row per level. A/B vs the r2 dense-baked + hash-tail encode at
production query width (393k packed queries).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from neuralradiancecaching_tpu.utils import setup_cache

setup_cache()

from neuralradiancecaching_tpu import config as cfg_mod
from neuralradiancecaching_tpu.ops import mrhe

N = 393216  # r2 packed query width (1080p * 0.19 query fraction, chunked)


def timeit(name, f, *args):
    out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].sum())
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].sum())
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt*1000:8.2f} ms  ({N/dt/1e6:7.1f} Mq/s)", flush=True)
    return out


def corner_hash_offsets(cfg):
    offs = mrhe._corner_offsets(cfg.n_dims)  # (C, D)
    primes = np.asarray(mrhe.HASH_PRIMES[:cfg.n_dims], dtype=np.uint64)
    return ((offs.astype(np.uint64) * primes).sum(-1)
            % np.uint64(cfg.table_size)).astype(np.int32)


def bake_oct(table, cfg):
    offs = corner_hash_offsets(cfg)
    parts = [jnp.roll(table, -int(o), axis=1) for o in offs]
    packed = jnp.concatenate(parts, axis=-1)  # (L, T, C*F)
    return packed.reshape(cfg.n_levels * cfg.table_size, -1)


def encode_with_oct(oct_rows, pos_norm, cfg):
    res = jnp.asarray(mrhe.resolutions(cfg), pos_norm.dtype)
    x = pos_norm[..., None, :] * res[:, None]
    x0 = jnp.floor(x)
    frac = x - x0
    base = x0.astype(jnp.int32)
    h = mrhe.hash_coords(base, cfg.table_size)  # (..., L)
    level_base = jnp.arange(cfg.n_levels, dtype=jnp.int32) * cfg.table_size
    rows = jnp.take(oct_rows, h + level_base, axis=0).astype(pos_norm.dtype)
    c = 1 << cfg.n_dims
    rows = rows.reshape(*rows.shape[:-1], c, cfg.n_features)
    offsets = jnp.asarray(mrhe._corner_offsets(cfg.n_dims))
    w = jnp.where(offsets.astype(bool), frac[..., None, :],
                  1.0 - frac[..., None, :])
    weights = jnp.prod(w, axis=-1)  # (..., L, C)
    feats = jnp.sum(rows * weights[..., None], axis=-2)
    return feats.reshape(*pos_norm.shape[:-1],
                         cfg.n_levels * cfg.n_features)


def main():
    cfg = cfg_mod.progressive_1080p_config()
    mcfg = cfg.mrhe
    quirks = cfg.quirks
    key = jax.random.PRNGKey(0)
    table = mrhe.init_table(key, mcfg)
    # include out-of-box positions to prove exactness everywhere
    pos = jax.random.uniform(jax.random.fold_in(key, 1), (N, 3),
                             minval=-0.2, maxval=1.2)

    # exactness: oct vs pure hash encode (fp32, small batch)
    oct_rows = bake_oct(table, mcfg)
    ref = mrhe.encode(table, pos[:32768], mcfg, quirks)
    got = encode_with_oct(oct_rows, pos[:32768], mcfg)
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"max |oct - encode| (fp32, incl. out-of-box): {err:.3e}")
    print(f"oct rows: {oct_rows.shape} "
          f"{oct_rows.size * oct_rows.dtype.itemsize / 2**20:.1f} MiB")

    baked = mrhe.bake_dense(table, mcfg).astype(jnp.bfloat16)
    oct_bf16 = oct_rows.astype(jnp.bfloat16)

    # production-style 32k chunking for the r2 paths (bigger one-program
    # encodes exceed the remote compile helper / HBM limits)
    def chunked(f):
        def run(*tables):
            return jax.lax.map(
                lambda p: f(*tables, p), pos.reshape(-1, 32768, 3)
            ).reshape(N, -1)
        return jax.jit(run)

    enc_hash = chunked(lambda t, p: mrhe.encode(t, p, mcfg, quirks))
    enc_dense = chunked(
        lambda t, b, p: mrhe.encode_with_baked(t, b, p, mcfg, quirks))
    enc_oct = jax.jit(lambda o, p: encode_with_oct(o, p, mcfg))

    timeit("hash encode 32k-chunked (128 rows)", enc_hash, table)
    timeit("dense-baked + tail 32k-chunked (79 rows)", enc_dense, table,
           baked)
    timeit("oct bf16 unchunked (16 rows)",
           lambda: enc_oct(oct_bf16, pos))
    timeit("oct fp32 unchunked (16 rows)",
           lambda: enc_oct(oct_rows, pos))

    t_bake = timeit("bake_oct (8 rolls)", jax.jit(
        lambda t: bake_oct(t, mcfg)), table)
    del t_bake


if __name__ == "__main__":
    main()
