"""Decompose train_only_step cost at reference-parity settings
(100x100 rays x 8 samples x 64 bounces) on the live chip."""

import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from neuralradiancecaching_tpu.utils import setup_cache

setup_cache()

import jax.numpy as jnp

from neuralradiancecaching_tpu import config as cfg_mod
from neuralradiancecaching_tpu.io import assets
from neuralradiancecaching_tpu.models import nrc
from neuralradiancecaching_tpu.render import frame as frame_mod, targets
from neuralradiancecaching_tpu.scene.camera import pixel_rays
from neuralradiancecaching_tpu.scene.scene import make_scene

REPS = 5


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    np.asarray(leaves[0].sum())


def timeit(name, fn, *args):
    fn(*args)
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(REPS):
        sync(fn(*args))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:28s} {dt*1000:8.1f} ms", flush=True)


def main():
    cfg = cfg_mod.progressive_1080p_config()
    scene = make_scene(cfg, assets.load_cloud(), assets.load_env_map())
    state = nrc.init_state(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(3)

    # NOTE: arrays must be jit ARGUMENTS -- closing over scene/state bakes
    # the ~200 MB fields into the HLO as constants and the remote compile
    # service rejects the request (HTTP 413)
    timeit("train_only_step",
           lambda k: frame_mod.train_only_step(state, scene, k, cfg), key)

    gen = jax.jit(targets.generate_train_batch, static_argnames=("cfg",))
    timeit("generate_train_batch", lambda k: gen(scene, cfg, k), key)

    ro, rd = pixel_rays(scene.camera, cfg.train.train_width,
                        cfg.train.train_height)
    choose = jax.jit(targets.choose_train_vertices,
                     static_argnames=("cfg",))
    timeit("choose_train_vertices",
           lambda k: choose(scene, cfg, ro, rd, k), key)

    pos, d = choose(scene, cfg, ro, rd, key)
    s = cfg.train.target_samples
    pos_t, d_t = jnp.tile(pos, (s, 1)), jnp.tile(d, (s, 1))
    tracet = jax.jit(targets.trace_target_paths, static_argnames=("cfg",))
    timeit("trace_target_paths",
           lambda k: tracet(scene, cfg, pos_t, d_t, k), key)

    batch = gen(scene, cfg, key)
    sync(batch)
    cg = jax.jit(nrc.compute_grads, static_argnames=("cfg",))
    timeit("compute_grads",
           lambda b: cg(state, b.pos, b.dir, b.target, cfg), batch)

    grads, _ = cg(state, batch.pos, batch.dir, batch.target, cfg)
    sync(grads)
    ag = jax.jit(nrc.apply_grads, static_argnames=("cfg",))
    timeit("apply_grads", lambda g: ag(state, g, cfg), grads)


if __name__ == "__main__":
    main()
