"""Microbench: cumsum+scatter compaction vs argsort at frame scale (TPU)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from neuralradiancecaching_tpu.utils import setup_cache

setup_cache()

from neuralradiancecaching_tpu.ops import compact

N = 1920 * 1080
K = 6
NK = N * K


def timeit(name, fn, *args):
    fn(*args)
    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0].sum())
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0].sum())
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].sum())
    print(f"{name:42s} {(time.perf_counter()-t0)/3*1000:8.1f} ms",
          flush=True)


def main():
    key = jax.random.PRNGKey(0)
    mask = jax.random.uniform(key, (NK,)) < 0.05
    flat = jax.random.normal(jax.random.PRNGKey(1), (NK, 7))

    for cap_frac, label in ((2.0, "cap 2.0N"), (0.5, "cap 0.5N")):
        cap = int(N * cap_frac)

        @jax.jit
        def pack(mask, flat, cap=cap):
            sel, val = compact.compact_select(mask, cap)
            rows = jnp.take(flat, sel, axis=0)
            ray = jnp.where(val, sel % N, N)
            out = jnp.zeros((N + 1, 3)).at[ray].add(
                rows[:, :3], mode="drop")[:N]
            return out

        timeit(f"cumsum pack+take+scatter_add {label}", pack, mask, flat)

        @jax.jit
        def select_only(mask, cap=cap):
            return compact.compact_select(mask, cap)

        timeit(f"compact_select only {label}", select_only, mask)

        @jax.jit
        def argsort_pack(mask, flat, cap=cap):
            sel = jnp.argsort(~mask)[:cap]
            rows = jnp.take(flat, sel, axis=0)
            ray = sel % N
            out = jnp.zeros((N, 3)).at[ray].add(rows[:, :3])
            return out

        timeit(f"argsort pack+take+scatter_add {label}", argsort_pack,
               mask, flat)

    @jax.jit
    def cumsum_only(mask):
        return jnp.cumsum(mask.astype(jnp.int32))

    timeit("cumsum only (12.4M)", cumsum_only, mask)

    @jax.jit
    def scatter_only(mask):
        pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
        cap = N
        slot = jnp.where(mask & (pos < cap), pos, cap)
        return jnp.zeros((cap + 1,), jnp.int32).at[slot].set(
            jnp.arange(NK, dtype=jnp.int32), mode="drop")[:cap]

    timeit("cumsum+scatter only (12.4M -> 2M)", scatter_only, mask)


if __name__ == "__main__":
    main()
