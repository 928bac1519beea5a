"""A/B dense_max_res for the query fast path: bake cost vs query cost (TPU)."""

import dataclasses
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
from neuralradiancecaching_tpu.io import assets
from neuralradiancecaching_tpu.models import nrc
from neuralradiancecaching_tpu.scene.scene import make_scene

N = 12 * 32768


def timeit(name, fn, *args):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].sum())
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].sum())
    print(f"{name:40s} {(time.perf_counter()-t0)/3*1000:8.1f} ms",
          flush=True)
    return out


def main():
    base = cfg_mod.progressive_1080p_config()
    scene = make_scene(base, assets.load_cloud(), assets.load_env_map())
    np.asarray(scene.density.sum())

    key = jax.random.PRNGKey(3)
    half = jnp.asarray(base.volume.box_size) * 0.5
    pos = (jax.random.uniform(key, (N, 3)) * 2.0 - 1.0) * half * 0.9
    d = jax.random.normal(jax.random.fold_in(key, 1), (N, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    for dmr in (64, 128, 160):
        cfg = dataclasses.replace(
            base, mrhe=dataclasses.replace(base.mrhe, dense_max_res=dmr))
        state = nrc.init_state(jax.random.PRNGKey(0), cfg)

        bake = jax.jit(lambda s, c=cfg: nrc.bake(s, c))
        baked = timeit(f"bake dense_max_res={dmr}", bake, state)

        @jax.jit
        def q(baked, pos, d, c=cfg, s=state):
            return jax.lax.map(
                lambda ab: nrc.query_baked(s, baked, ab[0], ab[1], c),
                (pos.reshape(-1, 32768, 3),
                 d.reshape(-1, 32768, 3))).reshape(N, 3)

        timeit(f"query 393k rows dmr={dmr}", q, baked, pos, d)


if __name__ == "__main__":
    main()
