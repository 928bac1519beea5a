"""Decompose ONE 32768-row cache-query chunk at the shipped 1080p
operating point: oct-row gather (incl. hash index math) vs lerp/encode
vs one-blob direction encode vs the 6-layer MLP. Timings are in-jit
fori_loops with a single device sync (the only reliable methodology on
axon, docs/PERFORMANCE.md), with a serializing carry so XLA cannot
overlap or CSE the repetitions. Also times the full production chunked
lax.map query at the bench cap for cross-checking against
profile_finish2's "query only" number."""

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
from neuralradiancecaching_tpu.models.nrc import _inference_mlp
from neuralradiancecaching_tpu.ops import mrhe as mrhe_ops
from neuralradiancecaching_tpu.ops import oneblob as oneblob_ops
from neuralradiancecaching_tpu.render import frame as frame_mod
from neuralradiancecaching_tpu.scene.scene import make_scene

W, H = 1920, 1080
CHUNK = int(os.environ.get("QSTEP_CHUNK", "32768"))
REPS = int(os.environ.get("QSTEP_REPS", "30"))


def main():
    cfg = cfg_mod.progressive_1080p_config()
    cfg = dataclasses.replace(
        cfg, camera=dataclasses.replace(cfg.camera, aspect=W / H),
        render=dataclasses.replace(cfg.render, width=W, height=H,
                                   use_nn=True))
    density = assets.load_cloud()
    env_img = assets.load_env_map()
    scene = make_scene(cfg, density, env_img)
    np.asarray(scene.env_t_field.sum())

    state = nrc.init_state(jax.random.PRNGKey(cfg.seed), cfg)
    state, _ = frame_mod.train_only_step(state, scene,
                                         jax.random.PRNGKey(100), cfg)
    baked = nrc.bake(state, cfg)
    np.asarray(baked.sum())

    k = jax.random.PRNGKey(7)
    # in-box positions + unit dirs, production chunk shape
    pos = (jax.random.uniform(k, (CHUNK, 3)) - 0.5) \
        * jnp.asarray(cfg.volume.box_size) \
        + jnp.asarray(cfg.volume.box_center)
    d = jax.random.normal(jax.random.fold_in(k, 1), (CHUNK, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    pos_norm = mrhe_ops.normalize_pos(pos, cfg.volume.box_size,
                                      cfg.volume.box_center)
    x_full = jnp.concatenate(
        [mrhe_ops.encode_with_oct(baked, pos_norm, cfg.mrhe, cfg.quirks,
                                  pos_raw=pos),
         oneblob_ops.encode_dir(d, cfg.oneblob, cfg.quirks)], axis=-1)

    res = jnp.asarray(mrhe_ops.resolutions(cfg.mrhe), dtype=pos_norm.dtype)
    level_base = (jnp.arange(cfg.mrhe.n_levels, dtype=jnp.int32)
                  * cfg.mrhe.table_size)

    def timed(name, fn, *args):
        @partial(jax.jit, static_argnames=())
        def loop(*a):
            def body(i, acc):
                out = fn(*a, acc)
                return acc + jnp.sum(out.astype(jnp.float32))
            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

        np.asarray(loop(*args))                      # compile
        t0 = time.perf_counter()
        np.asarray(loop(*args))
        dt = (time.perf_counter() - t0) / REPS * 1000
        print(f"{name:30s} {dt:8.2f} ms", flush=True)

    eps = jnp.float32(1e-30)

    timed("full query_baked", lambda p, dd, acc: nrc.query_baked(
        state, baked, p + eps * acc, dd, cfg), pos, d)
    timed("encode_with_oct", lambda pn, acc: mrhe_ops.encode_with_oct(
        baked, pn + eps * acc, cfg.mrhe, cfg.quirks,
        pos_raw=(pn + eps * acc)), pos_norm)

    def gather_only(pn, acc):
        x = (pn + eps * acc)[..., None, :] * res[:, None]
        h = mrhe_ops.hash_coords(jnp.floor(x).astype(jnp.int32),
                                 cfg.mrhe.table_size)
        return jnp.take(baked, h + level_base, axis=0)

    timed("hash + oct-row gather", gather_only, pos_norm)

    def hash_only(pn, acc):
        x = (pn + eps * acc)[..., None, :] * res[:, None]
        return mrhe_ops.hash_coords(jnp.floor(x).astype(jnp.int32),
                                    cfg.mrhe.table_size)

    timed("hash index math only", hash_only, pos_norm)
    timed("one-blob dir encode", lambda dd, acc: oneblob_ops.encode_dir(
        dd + eps * acc, cfg.oneblob, cfg.quirks), d)
    timed("inference MLP only", lambda xx, acc: _inference_mlp(
        state.mlp_params, xx + eps * acc, cfg), x_full)


if __name__ == "__main__":
    main()
