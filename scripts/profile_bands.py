"""Band-size sweep for the 1080p banded render on the live chip."""

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

W, H, FRAMES = 1920, 1080, 3


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
    np.asarray(state.hash_table.sum())

    for band in (54, 108, 216, 270, 540):
        try:
            fn = lambda k: render_banded(state, scene, k, base,
                                         band_rows=band)
            np.asarray(fn(jax.random.PRNGKey(42)).sum())
            t0 = time.perf_counter()
            for i in range(FRAMES):
                np.asarray(fn(jax.random.PRNGKey(43 + i)).sum())
            dt = (time.perf_counter() - t0) / FRAMES
            print(f"band {band:4d}: {dt*1000:8.1f} ms "
                  f"({W*H/dt/1e6:6.2f} Mrays/s)", flush=True)
        except Exception as e:
            print(f"band {band:4d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
