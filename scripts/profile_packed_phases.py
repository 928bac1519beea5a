"""March-vs-finish decomposition of the SHIPPED packed 1080p frame.

Times, pipelined (dispatch F frames, sync once -- the bench methodology;
standalone per-call timings carry ~25 ms of axon tunnel overhead):
  full    render_banded with all hoists (the bench headline path)
  march   _packed_bands_program alone (packed banded march + event record)
  finish  _finish_packed alone (event shade + query + un-pack + composite)
Caps default to the current bench operating point; override via
PP_QUERY_CAP / PP_SHADE_CAP / PP_PACK / PP_BOUNCES / PP_PHASE1 / PP_LIVE.
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
from neuralradiancecaching_tpu.render import tiled
from neuralradiancecaching_tpu.scene.scene import make_scene

W, H, BAND, FRAMES = 1920, 1080, 54, 8


def main():
    cfg = cfg_mod.progressive_1080p_config()
    cfg = dataclasses.replace(
        cfg,
        camera=dataclasses.replace(cfg.camera, aspect=W / H),
        render=dataclasses.replace(
            cfg.render, width=W, height=H, use_nn=True,
            query_cap_fraction=float(os.environ.get("PP_QUERY_CAP",
                                                    0.171875)),
            shade_cap_fraction=float(os.environ.get("PP_SHADE_CAP",
                                                    0.328125)),
            live_pack_fraction=float(os.environ.get("PP_PACK", 0.21875))),
        path=dataclasses.replace(
            cfg.path,
            max_bounces=int(os.environ.get("PP_BOUNCES",
                                           cfg.path.max_bounces)),
            march_phase1_steps=int(os.environ.get(
                "PP_PHASE1", cfg.path.march_phase1_steps)),
            march_live_fraction=float(os.environ.get(
                "PP_LIVE", cfg.path.march_live_fraction))),
    )
    density = assets.load_cloud()
    env_img = assets.load_env_map()
    t0 = time.perf_counter()
    scene = make_scene(cfg, density, env_img)
    np.asarray(scene.env_t_field.sum())
    print(f"scene bake {time.perf_counter()-t0:.1f} s", flush=True)

    state = nrc.init_state(jax.random.PRNGKey(cfg.seed), cfg)
    for i in range(3):
        state, _ = frame_mod.train_only_step(state, scene,
                                             jax.random.PRNGKey(100 + i),
                                             cfg)
    np.asarray(state.hash_table.sum())

    env_rgb = tiled.frame_env_color(scene, cfg)
    baked = nrc.bake(state, cfg)
    pack = tiled.frame_live_pack(scene, cfg, BAND)
    np.asarray(env_rgb.sum())

    def timeit(name, fn):
        out = fn(jax.random.PRNGKey(0))
        np.asarray(jax.tree_util.tree_leaves(out)[0].sum())
        t0 = time.perf_counter()
        for i in range(FRAMES):
            out = fn(jax.random.PRNGKey(1 + i))
        np.asarray(jax.tree_util.tree_leaves(out)[0].sum())
        dt = (time.perf_counter() - t0) / FRAMES
        print(f"{name:10s} {dt*1000:8.1f} ms ({W*H/dt/1e6:6.2f} Mrays/s)",
              flush=True)
        return out

    def full(key):
        return tiled.render_banded(state, scene, key, cfg, band_rows=BAND,
                                   env_rgb=env_rgb, baked=baked, pack=pack)

    def march(key):
        return tiled._packed_bands_program(scene, key, cfg, BAND, pack=pack)

    band_out = march(jax.random.PRNGKey(0))
    inv, rgb_p, trans_p, qp, qd, qw, ev = [
        jax.tree_util.tree_map(lambda x: x, t) for t in band_out]
    np.asarray(rgb_p.sum())

    def finish(key):
        del key
        return tiled._finish_packed(state, baked, scene, inv, rgb_p,
                                    trans_p, qp, qd, qw, ev, cfg,
                                    env_rgb=env_rgb)

    timeit("full", full)
    timeit("march", march)
    timeit("finish", finish)


if __name__ == "__main__":
    main()
