"""Sub-decompose the packed finish at the shipped 1080p operating point:
event shade vs cache query vs un-pack + env composite (pipelined timings,
one sync per window -- same methodology as profile_packed_phases)."""

import dataclasses
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from neuralradiancecaching_tpu.utils import setup_cache

setup_cache()

from neuralradiancecaching_tpu import config as cfg_mod
from neuralradiancecaching_tpu.io import assets
from neuralradiancecaching_tpu.models import nrc
from neuralradiancecaching_tpu.ops import compact
from neuralradiancecaching_tpu.render import frame as frame_mod
from neuralradiancecaching_tpu.render import pathtrace, tiled
from neuralradiancecaching_tpu.scene.scene import make_scene

W, H, BAND, FRAMES = 1920, 1080, 54, 8


def main():
    cfg = cfg_mod.progressive_1080p_config()
    cfg = dataclasses.replace(
        cfg,
        camera=dataclasses.replace(cfg.camera, aspect=W / H),
        render=dataclasses.replace(
            cfg.render, width=W, height=H, use_nn=True,
            query_cap_fraction=0.171875, shade_cap_fraction=0.328125,
            live_pack_fraction=0.21875),
    )
    density = assets.load_cloud()
    env_img = assets.load_env_map()
    scene = make_scene(cfg, density, env_img)
    np.asarray(scene.env_t_field.sum())

    state = nrc.init_state(jax.random.PRNGKey(cfg.seed), cfg)
    for i in range(3):
        state, _ = frame_mod.train_only_step(state, scene,
                                             jax.random.PRNGKey(100 + i),
                                             cfg)
    np.asarray(state.hash_table.sum())

    env_rgb = tiled.frame_env_color(scene, cfg)
    baked = nrc.bake(state, cfg)
    pack = tiled.frame_live_pack(scene, cfg, BAND)
    inv, rgb_p, trans_p, qp, qd, qw, ev = tiled._packed_bands_program(
        scene, jax.random.PRNGKey(0), cfg, BAND, pack=pack)
    np.asarray(rgb_p.sum())
    n_pack = rgb_p.shape[0]
    n = W * H
    print(f"packed width {n_pack} ({n_pack/n:.3f} of frame), "
          f"ev slots K={ev.shape[1]}", flush=True)

    def timeit(name, fn):
        out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0].sum())
        t0 = time.perf_counter()
        for _ in range(FRAMES):
            out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0].sum())
        print(f"{name:26s} {(time.perf_counter()-t0)/FRAMES*1000:8.1f} ms",
              flush=True)

    no_ev = jnp.zeros((n_pack, 0, 7), dtype=ev.dtype)

    @partial(jax.jit, static_argnames=("with_ev", "qcap"))
    def saq(state, baked, rgb_p, qp, qd, qw, ev, with_ev=True,
            qcap=0.171875):
        c = dataclasses.replace(
            cfg, render=dataclasses.replace(cfg.render,
                                            query_cap_fraction=qcap))
        def query_fn(qpos, qdir):
            return nrc.query_baked(state, baked, qpos, qdir, c)
        return pathtrace.shade_and_query(
            scene, c, rgb_p, qp, qd, qw, query_fn,
            events=ev if with_ev else None, cap_n=n)

    @jax.jit
    def unpack_env(rgb_p, trans_p):
        rgbt = jnp.concatenate([rgb_p, trans_p[:, None]], axis=1)
        out = compact.gather_back(inv, rgbt,
                                  jnp.asarray([0, 0, 0, 1], rgbt.dtype))
        return out[:, :3] + out[:, 3:4] * env_rgb

    timeit("shade+query (full)", lambda: saq(state, baked, rgb_p, qp, qd,
                                             qw, ev))
    timeit("query only (ev off)", lambda: saq(state, baked, rgb_p, qp, qd,
                                              qw, no_ev, with_ev=False))
    timeit("query 1-chunk (cap 1/64)", lambda: saq(
        state, baked, rgb_p, qp, qd, qw, no_ev, with_ev=False,
        qcap=0.015625))
    timeit("unpack + env composite", lambda: unpack_env(rgb_p, trans_p))


if __name__ == "__main__":
    main()
