"""A/B frame-global live-ray packing at 1080p (TPU)."""

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
    base = cfg_mod.progressive_1080p_config()
    base = dataclasses.replace(
        base,
        camera=dataclasses.replace(base.camera, aspect=W / H),
        render=dataclasses.replace(base.render, width=W, height=H,
                                   query_cap_fraction=0.25,
                                   shade_cap_fraction=0.5))
    scene = make_scene(base, assets.load_cloud(), assets.load_env_map())
    np.asarray(scene.coll_field.sum())
    state = nrc.init_state(jax.random.PRNGKey(0), base)
    for i in range(2):
        state, _ = frame_mod.train_only_step(state, scene,
                                             jax.random.PRNGKey(i), base)
    np.asarray(state.hash_table.sum())

    for pack in (0.0, 0.4375, 0.3125):
        cfg = dataclasses.replace(
            base, render=dataclasses.replace(base.render,
                                             live_pack_fraction=pack))

        def run(key):
            img = render_banded(state, scene, key, cfg, band_rows=54)
            np.asarray(img.sum())
            return img

        img = run(jax.random.PRNGKey(0))
        t0 = time.perf_counter()
        for i in range(4):
            img = run(jax.random.PRNGKey(1 + i))
        dt = (time.perf_counter() - t0) / 4
        print(f"pack={pack:6.4f}  {dt*1000:8.1f} ms "
              f"({W*H/dt/1e6:5.2f} Mrays/s) mean="
              f"{float(np.asarray(img.mean())):.4f}", flush=True)


if __name__ == "__main__":
    main()
