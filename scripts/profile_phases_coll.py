"""Phase-cost breakdown of the collision-sampler 1080p frame."""

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
from neuralradiancecaching_tpu.render.tiled import _bands_program, render_banded
from neuralradiancecaching_tpu.scene.scene import make_scene

W, H, BAND, FRAMES = 1920, 1080, 54, 3


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
                                   query_cap_fraction=0.25,
                                   shade_cap_fraction=0.5))
    t0 = time.perf_counter()
    scene = make_scene(base, assets.load_cloud(), assets.load_env_map())
    sync(scene.coll_field)
    print(f"scene build: {time.perf_counter()-t0:.1f} s", flush=True)
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
        "nosplit": dataclasses.replace(
            base, path=dataclasses.replace(base.path, coll_phase1_steps=0)),
    }
    for name, cfg in variants.items():
        timeit(name, lambda k, c=cfg: render_banded(state, scene, k, c,
                                                    band_rows=BAND),
               jax.random.PRNGKey(42))
    # bands program alone (march + shade, no finish/query dispatch)
    timeit("bands only (march+shade)",
           lambda k: _bands_program(scene, k, base, BAND)[0],
           jax.random.PRNGKey(42))
    nq = variants["noenv+noquery"]
    timeit("bands only, noenv+noq",
           lambda k: _bands_program(scene, k, nq, BAND)[0],
           jax.random.PRNGKey(42))

    def train(k):
        s2, mse = frame_mod.train_only_step(state, scene, k, base)
        return mse
    timeit("train_only_step (collision)", train, jax.random.PRNGKey(7))


if __name__ == "__main__":
    main()
