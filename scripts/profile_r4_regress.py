"""Isolate the r4 throughput regression (19.2 -> 6.8 Mrays/s @1080p).

A/B the three r4 default changes on the timed banded render, bench-style
hoists included: exact entry tau (entry_tau_steps), scatter-field
out-buckets (field_out_buckets), scatter bake knobs (quad dirs/steps --
bake-time only, should be inert). Prints ms/frame per leg.

LEGS env: comma list from {r4, no_etau, ob8, r3}.
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("NRC_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["NRC_PLATFORM"])

import numpy as np

from neuralradiancecaching_tpu.utils import setup_cache

setup_cache()

from neuralradiancecaching_tpu import config as cfg_mod
from neuralradiancecaching_tpu.io import assets
from neuralradiancecaching_tpu.models import nrc
from neuralradiancecaching_tpu.render import frame as frame_mod
from neuralradiancecaching_tpu.render.tiled import (frame_env_color,
                                                    frame_live_pack,
                                                    render_banded)
from neuralradiancecaching_tpu.scene.scene import make_scene

W, H, BAND, FRAMES = 1920, 1080, 54, 10


def leg_cfg(name):
    cfg = cfg_mod.progressive_1080p_config()
    cfg = dataclasses.replace(
        cfg, camera=dataclasses.replace(cfg.camera, aspect=W / H),
        render=dataclasses.replace(cfg.render, width=W, height=H, spp=1,
                                   use_nn=True))
    if name in ("no_etau", "r3"):
        cfg = dataclasses.replace(cfg, path=dataclasses.replace(
            cfg.path, entry_tau_steps=0))
    if name in ("ob8", "r3"):
        cfg = dataclasses.replace(cfg, volume=dataclasses.replace(
            cfg.volume, field_out_buckets=(8, 16)))
    if name == "r3":
        cfg = dataclasses.replace(cfg, env_map=dataclasses.replace(
            cfg.env_map, scatter_quad_dirs=None, scatter_bake_steps=None))
    return cfg


def main():
    density = assets.load_cloud()
    env_img = assets.load_env_map()
    legs = os.environ.get("LEGS", "r4,no_etau,ob8,r3").split(",")
    for name in legs:
        cfg = leg_cfg(name)
        t0 = time.perf_counter()
        scene = make_scene(cfg, density, env_img)
        np.asarray(scene.coll_field.sum())
        bake_s = time.perf_counter() - t0
        state = nrc.init_state(jax.random.PRNGKey(cfg.seed), cfg)
        # bench caps (from the r4 bench run: qcap uncapped w/ pack,
        # shade 0.28125, pack 0.21875 -- identical across legs)
        cfg = dataclasses.replace(cfg, render=dataclasses.replace(
            cfg.render, query_cap_fraction=1.0, shade_cap_fraction=0.28125,
            live_pack_fraction=0.21875,
            query_chunk=cfg.render.query_chunk))
        env_rgb = frame_env_color(scene, cfg)
        baked = nrc.bake(state, cfg)
        pack = frame_live_pack(scene, cfg, BAND)
        np.asarray(env_rgb.sum())

        def run(key, sync=True):
            img = render_banded(state, scene, key, cfg, band_rows=BAND,
                                env_rgb=env_rgb, baked=baked, pack=pack)
            if sync:
                np.asarray(img.sum())
            return img

        t0 = time.perf_counter()
        run(jax.random.PRNGKey(0))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(FRAMES):
            run(jax.random.PRNGKey(1 + i), sync=(i == FRAMES - 1))
        dt = (time.perf_counter() - t0) / FRAMES
        print(f"{name:8s} bake {bake_s:5.1f}s  compile {compile_s:6.1f}s  "
              f"{dt * 1000:7.1f} ms/frame  "
              f"{W * H / dt / 1e6:6.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
