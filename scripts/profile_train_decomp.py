"""Decompose the bench train step (frame.train_only_step at the progressive
1080p config: 100x100 rays x vertex_oversample 8 -> 10k vertices, 8x64
collision target walks) into its phases, and measure the no-NN walk's
live-lane decay to size a march split (coll_nonn_phase1_steps/
coll_nonn_live_fraction).

Phases timed (each jitted separately, 5-run mean after warmup):
  pool+vertex  train_ray_pool + oversampled use_nn walk + compact_select
  nee          trace_scene at the 10k vertices
  target_march trace_path_collision(use_nn=False, collect_events=True)
               at 80k lanes (march only, no shading)
  target_full  the same walk WITH prefix-packed shading
  grads+step   nrc.train_step on a fixed batch
  total        frame.train_only_step (the benched program)
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("NRC_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["NRC_PLATFORM"])

import jax.numpy as jnp
import numpy as np

from neuralradiancecaching_tpu.utils import setup_cache

setup_cache()

from neuralradiancecaching_tpu import config as cfg_mod
from neuralradiancecaching_tpu.io import assets
from neuralradiancecaching_tpu.models import nrc
from neuralradiancecaching_tpu.ops import phase as phase_ops
from neuralradiancecaching_tpu.render import frame as frame_mod
from neuralradiancecaching_tpu.render import pathtrace, targets
from neuralradiancecaching_tpu.scene.scene import make_scene

RUNS = int(os.environ.get("RUNS", 5))


def timeit(name, fn, *args):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].sum())  # hard sync
    t0 = time.perf_counter()
    for _ in range(RUNS):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].sum())
    dt = (time.perf_counter() - t0) / RUNS * 1000
    print(f"{name:14s} {dt:8.2f} ms", flush=True)
    return out


def main():
    cfg = cfg_mod.progressive_1080p_config()
    tcfg = None  # set after scene build: the row-tau train cfg
    density = assets.load_cloud()
    env_img = assets.load_env_map()
    scene = make_scene(cfg, density, env_img)
    state = nrc.init_state(jax.random.PRNGKey(cfg.seed), cfg)
    print("scene + state ready", flush=True)

    key = jax.random.PRNGKey(7)
    tcfg = targets._train_walk_cfg(cfg)

    # --- live-lane decay of the no-NN target walk (sizes the split) ---
    @jax.jit
    def live_decay(sc, key):
        k_v, k_t = jax.random.split(key)
        ro, rd = targets.train_ray_pool(sc, cfg, k_v)
        res = pathtrace.trace_path_collision(sc, tcfg, ro, rd, k_v,
                                             use_nn=True, env_samples=0)
        has = res.query_weight > 0.0
        n = ro.shape[0] // max(1, cfg.train.vertex_oversample)
        # compact-select REAL cut vertices like _collision_train_batch --
        # the first-n slice previously diluted the measured liveness with
        # non-cut fallback lanes (slot-0 live read 0.25; the real target
        # batch measures 0.93, the r5 cap-probe correction)
        from neuralradiancecaching_tpu.ops import compact
        sel, _ = compact.compact_select(has, n)
        pos = jnp.take(res.query_pos, sel, axis=0)
        d = jnp.take(res.query_dir, sel, axis=0)
        s = cfg.train.target_samples
        pos_t = jnp.tile(pos, (s, 1))
        d_in = jnp.tile(d, (s, 1))
        d_t = phase_ops.sample_hg_direction(k_t, d_in, cfg.volume.hg_g)
        # march WITH event collection: per-slot weights expose liveness
        _, ev = pathtrace.trace_path_collision(
            sc, tcfg, pos_t, d_t, k_t, use_nn=False,
            env_samples=cfg.train.env_samples,
            max_bounces=cfg.train.target_bounces, collect_events=True)
        w = ev[..., 6].astype(jnp.float32)  # (N, K) ray-major
        alive = (w > 0.0)
        return alive.mean(axis=0), alive.sum(axis=1).mean(), has.mean()

    frac, ev_mean, cut_frac = live_decay(scene, key)
    frac = np.asarray(frac)
    print(f"cut fraction {float(cut_frac):.3f}  mean events/lane "
          f"{float(ev_mean):.2f}", flush=True)
    # (with the r5 collect-mode split active in the train cfg, the event
    # stack only carries the phase-1 slots -- phase-2 shades in-band)
    for k in [0, 2, 4, 6, 8, 12, 16, 24, 32, 48, 63]:
        if k < frac.shape[0]:
            print(f"  slot {k:3d}: live {frac[k]:.4f}", flush=True)

    # --- phase timings ---
    over = max(1, cfg.train.vertex_oversample)
    n = cfg.train.train_width * cfg.train.train_height

    @jax.jit
    def pool_vertex(sc, key):
        ro, rd = targets.train_ray_pool(sc, cfg, key)
        res = pathtrace.trace_path_collision(sc, tcfg, ro, rd, key,
                                             use_nn=True, env_samples=0)
        return res.query_pos[:n], res.query_dir[:n]

    pos, d = timeit("pool+vertex", pool_vertex, scene, key)

    @jax.jit
    def nee(sc, pos, d, key):
        return pathtrace.trace_scene(sc, cfg, pos, d, key,
                                     cfg.train.env_samples)

    timeit("nee", nee, scene, pos, d, key)

    s_count = cfg.train.target_samples
    pos_t = jnp.tile(pos, (s_count, 1))
    d_t = phase_ops.sample_hg_direction(key, jnp.tile(d, (s_count, 1)),
                                        cfg.volume.hg_g)

    @jax.jit
    def target_march(sc, pos_t, d_t, key):
        _, ev = pathtrace.trace_path_collision(
            sc, tcfg, pos_t, d_t, key, use_nn=False,
            env_samples=cfg.train.env_samples,
            max_bounces=cfg.train.target_bounces, collect_events=True)
        return ev[..., 6].sum()

    timeit("target_march", target_march, scene, pos_t, d_t, key)

    @jax.jit
    def target_full(sc, pos_t, d_t, key):
        res = pathtrace.trace_path_collision(
            sc, tcfg, pos_t, d_t, key, use_nn=False,
            env_samples=cfg.train.env_samples,
            max_bounces=cfg.train.target_bounces)
        return res.scattered

    out_sc = timeit("target_full", target_full, scene, pos_t, d_t, key)

    target = jnp.minimum(jnp.mean(out_sc.reshape(s_count, n, 3), axis=0),
                         cfg.train.target_clamp)

    @jax.jit
    def grads_step(state, pos, d, target):
        return nrc.train_step(state, pos, d, target, cfg)

    timeit("grads+step", grads_step, state, pos, d, target)

    def total(state, key):
        return frame_mod.train_only_step(state, scene, key, cfg)

    timeit("total", total, state, key)


if __name__ == "__main__":
    main()
