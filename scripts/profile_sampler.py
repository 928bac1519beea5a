"""A/B the collision sampler vs the reference march at 1080p on the chip."""

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
    base = cfg_mod.progressive_1080p_config()  # sampler='collision' now
    base = dataclasses.replace(
        base,
        camera=dataclasses.replace(base.camera, aspect=W / H),
        render=dataclasses.replace(base.render, width=W, height=H,
                                   query_cap_fraction=0.25))
    ref = dataclasses.replace(
        base, path=dataclasses.replace(base.path, sampler="reference"))

    t0 = time.perf_counter()
    scene = make_scene(base, assets.load_cloud(), assets.load_env_map())
    sync(scene.coll_field)
    print(f"scene build (incl. collision field): "
          f"{time.perf_counter()-t0:.1f} s", flush=True)

    state = nrc.init_state(jax.random.PRNGKey(0), base)
    for i in range(2):
        state, _ = frame_mod.train_only_step(state, scene,
                                             jax.random.PRNGKey(i), ref)
    sync(state.hash_table)

    timeit("collision sampler", lambda k: render_banded(state, scene, k,
                                                        base,
                                                        band_rows=BAND),
           jax.random.PRNGKey(42))
    img = render_banded(state, scene, jax.random.PRNGKey(42), base, BAND)
    print(f"  mean radiance (collision): {float(np.asarray(img).mean()):.4f}",
          flush=True)
    timeit("reference sampler", lambda k: render_banded(state, scene, k,
                                                        ref,
                                                        band_rows=BAND),
           jax.random.PRNGKey(42))
    img = render_banded(state, scene, jax.random.PRNGKey(42), ref, BAND)
    print(f"  mean radiance (reference): {float(np.asarray(img).mean()):.4f}",
          flush=True)


if __name__ == "__main__":
    main()
