"""A/B the entry-kill and fused-MLP changes one at a time on the chip."""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from neuralradiancecaching_tpu.utils import setup_cache

setup_cache()

from neuralradiancecaching_tpu import config as cfg_mod
from neuralradiancecaching_tpu.io import assets
from neuralradiancecaching_tpu.models import nrc
from neuralradiancecaching_tpu.render import frame as frame_mod
from neuralradiancecaching_tpu.render.tiled import render_banded
from neuralradiancecaching_tpu.scene.scene import make_scene

W, H, BAND, FRAMES = 1920, 1080, 108, 3


def sync(x):
    np.asarray(x.sum() if hasattr(x, "sum") else x)


def timeit(name, fn, *args):
    fn(*args)
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(FRAMES):
        sync(fn(*args))
    dt = (time.perf_counter() - t0) / FRAMES
    print(f"{name:28s} {dt*1000:8.1f} ms ({W*H/dt/1e6:6.2f} Mrays/s)",
          flush=True)


def main():
    base = cfg_mod.progressive_1080p_config()
    base = dataclasses.replace(
        base,
        camera=dataclasses.replace(base.camera, aspect=W / H),
        render=dataclasses.replace(base.render, width=W, height=H,
                                   query_cap_fraction=0.25))
    scene = make_scene(base, assets.load_cloud(), assets.load_env_map())
    state = nrc.init_state(jax.random.PRNGKey(0), base)
    for i in range(2):
        state, _ = frame_mod.train_only_step(state, scene,
                                             jax.random.PRNGKey(i), base)
    sync(state.hash_table)

    def var(entry, fused):
        return dataclasses.replace(
            base,
            path=dataclasses.replace(base.path,
                                     march_entry_fraction=entry),
            mlp=dataclasses.replace(base.mlp, fused_inference=fused))

    for name, cfg in [
        ("entry0.375+fused", var(0.375, True)),
        ("entry0.375+jnp", var(0.375, False)),
        ("noentry+fused", var(0.0, True)),
        ("noentry+jnp", var(0.0, False)),
    ]:
        timeit(name, lambda k, c=cfg: render_banded(state, scene, k, c,
                                                    band_rows=BAND),
               jax.random.PRNGKey(42))

    def train(k):
        _, mse = frame_mod.train_only_step(state, scene, k, base)
        return mse
    timeit("train_only_step", train, jax.random.PRNGKey(7))


if __name__ == "__main__":
    main()
