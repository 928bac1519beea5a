"""Band-size sweep for the march-only bands + deferred finish (TPU)."""

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

W, H = 1920, 1080


def main():
    cfg = cfg_mod.progressive_1080p_config()
    cfg = dataclasses.replace(
        cfg,
        camera=dataclasses.replace(cfg.camera, aspect=W / H),
        render=dataclasses.replace(cfg.render, width=W, height=H,
                                   query_cap_fraction=0.25,
                                   shade_cap_fraction=0.5))
    scene = make_scene(cfg, assets.load_cloud(), assets.load_env_map())
    np.asarray(scene.coll_field.sum())
    state = nrc.init_state(jax.random.PRNGKey(0), cfg)
    for i in range(2):
        state, _ = frame_mod.train_only_step(state, scene,
                                             jax.random.PRNGKey(i), cfg)
    np.asarray(state.hash_table.sum())

    for band in (54, 108, 216, 540, 1080):
        try:
            def run(k, b=band):
                img = render_banded(state, scene, k, cfg, band_rows=b)
                np.asarray(img.sum())
                return img

            run(jax.random.PRNGKey(0))
            t0 = time.perf_counter()
            for i in range(3):
                run(jax.random.PRNGKey(1 + i))
            dt = (time.perf_counter() - t0) / 3
            print(f"band {band:5d}  {dt*1000:8.1f} ms  "
                  f"({W*H/dt/1e6:5.2f} Mrays/s)", flush=True)
        except Exception as e:
            print(f"band {band:5d}  FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
