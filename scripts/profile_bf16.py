"""A/B bf16 field storage for the banded 1080p render (TPU)."""

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

    scene_bf16 = scene._replace(
        env_t_field=scene.env_t_field.astype(jnp.bfloat16),
        env_s_field=scene.env_s_field.astype(jnp.bfloat16),
        coll_field=scene.coll_field.astype(jnp.bfloat16))
    cfg_bf16 = dataclasses.replace(
        cfg, volume=dataclasses.replace(cfg.volume, field_dtype="bfloat16"))

    for name, sc, c in (("f32 fields", scene, cfg),
                        ("bf16 fields", scene_bf16, cfg_bf16)):
        def run(k):
            img = render_banded(state, sc, k, c, band_rows=54)
            np.asarray(img.sum())
            return img

        img = run(jax.random.PRNGKey(0))
        t0 = time.perf_counter()
        for i in range(3):
            img = run(jax.random.PRNGKey(1 + i))
        dt = (time.perf_counter() - t0) / 3
        print(f"{name:14s} {dt*1000:8.1f} ms ({W*H/dt/1e6:5.2f} Mrays/s)"
              f"  mean={float(np.asarray(img.mean())):.4f}", flush=True)

        st, mse = frame_mod.train_only_step(state, sc, jax.random.PRNGKey(9),
                                            c)
        np.asarray(mse)
        t0 = time.perf_counter()
        for i in range(3):
            st, mse = frame_mod.train_only_step(st, sc,
                                                jax.random.PRNGKey(10 + i), c)
            np.asarray(mse)
        print(f"{name:14s} train {(time.perf_counter()-t0)/3*1000:7.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
