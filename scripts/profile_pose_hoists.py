"""Per-pose hoist cost at 1080p (VERDICT r4 item 2): what a camera move
actually costs before the frame can render.

The static bench hoists pose-static work (env composite, live-ray pack,
exact entry tau) out of the loop; a moving camera pays it EVERY frame.
This probe times each hoist separately and the moving frame end-to-end:

  env        frame_env_color (full-frame direct-env gather)
  pack0      frame_live_pack with entry_tau_steps=0 (mask + compact +
             packed-ray gathers only)
  pack       frame_live_pack shipped (pack0 + exact entry tau quadrature
             over the packed lanes)
  render     render_banded with all hoists precomputed (the static frame)
  moving     env + pack + render per pose (the online_fps_moving frame,
             train excluded)

Env: RUNS (default 20), ETAU (quadrature steps A/B list, default
"64"), WIDTH/HEIGHT, PACK_CAP (default 0.25).
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
from neuralradiancecaching_tpu.scene import camera as cam_mod
from neuralradiancecaching_tpu.scene.scene import make_scene

RUNS = int(os.environ.get("RUNS", 20))
W = int(os.environ.get("WIDTH", 1920))
H = int(os.environ.get("HEIGHT", 1080))
BAND = int(os.environ.get("BAND", 54))
PACK_CAP = float(os.environ.get("PACK_CAP", 0.25))
ETAUS = [int(x) for x in os.environ.get("ETAU", "64").split(",")]


def sync(x):
    np.asarray(x.sum() if hasattr(x, "sum") else x)


def time_loop(fn, n=RUNS):
    fn(0)  # warm/compile
    sync_out = fn(1)
    sync(sync_out)
    t0 = time.perf_counter()
    out = None
    for i in range(n):
        out = fn(2 + i)
    sync(out)
    return (time.perf_counter() - t0) / n * 1000


def main():
    cfg = cfg_mod.progressive_1080p_config()
    cfg = dataclasses.replace(
        cfg,
        camera=dataclasses.replace(cfg.camera, aspect=W / H),
        render=dataclasses.replace(cfg.render, width=W, height=H,
                                   query_cap_fraction=1.0,
                                   shade_cap_fraction=0.28125,
                                   live_pack_fraction=PACK_CAP))
    density = assets.load_cloud()
    env_img = assets.load_env_map()
    scene = make_scene(cfg, density, env_img)
    state = nrc.init_state(jax.random.PRNGKey(0), cfg)
    for i in range(3):
        state, _ = frame_mod.train_only_step(state, scene,
                                             jax.random.PRNGKey(i), cfg)
    baked = nrc.bake(state, cfg)
    sync(baked[0] if isinstance(baked, (tuple, list)) else baked)

    def orbit_scene(i):
        pos, vdir = cam_mod.orbit_position(i, 360, radius=64.0)
        return scene._replace(camera=cam_mod.make_camera(
            cfg.camera, position=pos, view_dir=vdir))

    scenes = [orbit_scene(i) for i in range(RUNS + 2)]

    t_env = time_loop(lambda i: frame_env_color(scenes[i], cfg))
    print(f"env composite        {t_env:8.2f} ms/pose", flush=True)

    cfg0 = dataclasses.replace(cfg, path=dataclasses.replace(
        cfg.path, entry_tau_steps=0))
    t_pack0 = time_loop(lambda i: frame_live_pack(scenes[i], cfg0, BAND)[2])
    print(f"pack (no etau)       {t_pack0:8.2f} ms/pose", flush=True)

    packs = {}
    for et in ETAUS:
        cfge = dataclasses.replace(cfg, path=dataclasses.replace(
            cfg.path, entry_tau_steps=et))
        t_pack = time_loop(
            lambda i, c=cfge: frame_live_pack(scenes[i], c, BAND)[5])
        packs[et] = t_pack
        print(f"pack (etau={et:3d})      {t_pack:8.2f} ms/pose "
              f"(etau part ~{t_pack - t_pack0:6.2f})", flush=True)

    env_rgb = frame_env_color(scenes[0], cfg)
    pk = frame_live_pack(scenes[0], cfg, BAND)
    sync(pk[5])

    def render_static(i):
        return render_banded(state, scenes[0], jax.random.PRNGKey(i), cfg,
                             band_rows=BAND, env_rgb=env_rgb, baked=baked,
                             pack=pk)

    t_render = time_loop(render_static)
    print(f"render (hoisted)     {t_render:8.2f} ms/frame", flush=True)

    def moving(i):
        sc = scenes[i]
        e = frame_env_color(sc, cfg)
        p = frame_live_pack(sc, cfg, BAND)
        return render_banded(state, sc, jax.random.PRNGKey(i), cfg,
                             band_rows=BAND, env_rgb=e, baked=baked,
                             pack=p)

    t_move = time_loop(moving)
    print(f"moving frame (e2e)   {t_move:8.2f} ms/pose "
          f"(hoist overhead {t_move - t_render:6.2f})", flush=True)


if __name__ == "__main__":
    main()
