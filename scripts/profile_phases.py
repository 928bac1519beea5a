"""Phase-cost breakdown of the 1080p NRC frame on the live chip.

Times render_banded variants that disable one phase at a time:
  full        -- bench configuration (query cap auto 0.25)
  noquery     -- show_non_nn=True (march + shade, no hash encode/MLP)
  noenv       -- env_samples=0 (march + segment-tau only in shade)
  noenv+noq   -- both off (march + segment-tau floor)
plus train_only_step and bake.

Run alone (never concurrently with another TPU process).
"""

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
    fn(*args)  # compile + warm
    sync_out = fn(*args)
    sync(sync_out)
    t0 = time.perf_counter()
    for _ in range(FRAMES):
        out = fn(*args)
        sync(out)
    dt = (time.perf_counter() - t0) / FRAMES
    print(f"{name:24s} {dt*1000:8.1f} ms  "
          f"({W*H/dt/1e6:6.2f} Mrays/s)", flush=True)
    return dt


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

    variants = {
        "full": base,
        "noquery": dataclasses.replace(
            base, render=dataclasses.replace(base.render, show_non_nn=True)),
        "noenv": dataclasses.replace(
            base, env_map=dataclasses.replace(base.env_map, n_samples=0)),
        "noenv+noquery": dataclasses.replace(
            base,
            render=dataclasses.replace(base.render, show_non_nn=True),
            env_map=dataclasses.replace(base.env_map, n_samples=0)),
        "nocompact": dataclasses.replace(
            base, path=dataclasses.replace(base.path, compact_events=0.0)),
    }
    for name, cfg in variants.items():
        timeit(name, lambda k, c=cfg: render_banded(state, scene, k, c,
                                                    band_rows=BAND),
               jax.random.PRNGKey(42))

    def train(k):
        s2, mse = frame_mod.train_only_step(state, scene, k, base)
        return mse
    timeit("train_only_step", train, jax.random.PRNGKey(7))

    timeit("bake", lambda _: nrc.bake(state, base), 0)


if __name__ == "__main__":
    main()
