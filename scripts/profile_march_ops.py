"""Decompose the collision march step: gather vs knots vs HG vs state
(marginal scan-step cost at band width, TPU)."""

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
from neuralradiancecaching_tpu.ops import collision
from neuralradiancecaching_tpu.ops import phase as phase_ops
from neuralradiancecaching_tpu.scene.scene import make_scene

N = 1920 * 54  # band width


def marginal(name, mk_scan):
    f8 = mk_scan(8)
    f24 = mk_scan(24)
    for f in (f8, f24):
        np.asarray(jax.tree_util.tree_leaves(f())[0].sum())
    ts = []
    for f in (f8, f24):
        t0 = time.perf_counter()
        for _ in range(3):
            np.asarray(jax.tree_util.tree_leaves(f())[0].sum())
        ts.append((time.perf_counter() - t0) / 3)
    per = (ts[1] - ts[0]) / 16
    print(f"{name:34s} {per*1000:7.2f} ms/step ({N/per/1e6:6.1f} M/s)",
          flush=True)


def main():
    cfg = cfg_mod.progressive_1080p_config()
    scene = make_scene(cfg, assets.load_cloud(), assets.load_env_map())
    np.asarray(scene.coll_field.sum())
    vol = cfg.volume
    key = jax.random.PRNGKey(0)
    half = jnp.asarray(vol.box_size) * 0.5
    pos0 = (jax.random.uniform(key, (N, 3)) * 2 - 1) * half * 0.9
    dir0 = jax.random.normal(jax.random.fold_in(key, 1), (N, 3))
    dir0 = dir0 / jnp.linalg.norm(dir0, axis=-1, keepdims=True)

    field = scene.coll_field

    def mk_gather_only(steps):
        @jax.jit
        def f(field=field, p=pos0, d=dir0):
            def step(c, u):
                pp, dd = c
                tau, knots = collision.query_collision_rows(field, pp, dd,
                                                            vol)
                pp = pp + tau[:, None] * 1e-6  # consume
                return (pp, dd), None
            u = jnp.zeros((steps, N))
            (pp, _), _ = jax.lax.scan(step, (p, d), u)
            return pp
        return f

    def mk_gather_knots(steps):
        @jax.jit
        def f(field=field, p=pos0, d=dir0, k=key):
            us = jax.random.uniform(k, (steps, N))
            def step(c, u):
                pp, dd = c
                tau, knots = collision.query_collision_rows(field, pp, dd,
                                                            vol)
                t = collision.knots_to_distance(tau, knots, u)
                pp = jnp.clip(pp + t[:, None] * dd, -half, half)
                return (pp, dd), None
            (pp, _), _ = jax.lax.scan(step, (p, d), us)
            return pp
        return f

    def mk_full_nohg(steps):
        @jax.jit
        def f(field=field, p=pos0, d=dir0, k=key):
            us = jax.random.uniform(k, (steps, 4, N))
            def step(c, u):
                pp, dd, w = c
                tau, knots = collision.query_collision_rows(field, pp, dd,
                                                            vol)
                p_sc = -jnp.expm1(-tau)
                t = collision.knots_to_distance(tau, knots, u[1])
                x = jnp.clip(pp + t[:, None] * dd, -half, half)
                w = w * p_sc
                return (x, dd, w), (x, w)
            (pp, _, w), ys = jax.lax.scan(step, (p, d, jnp.ones(N)), us)
            return pp
        return f

    def mk_full_hg(steps):
        @jax.jit
        def f(field=field, p=pos0, d=dir0, k=key):
            us = jax.random.uniform(k, (steps, 4, N))
            def step(c, u):
                pp, dd, w = c
                tau, knots = collision.query_collision_rows(field, pp, dd,
                                                            vol)
                p_sc = -jnp.expm1(-tau)
                t = collision.knots_to_distance(tau, knots, u[1])
                x = jnp.clip(pp + t[:, None] * dd, -half, half)
                nd = phase_ops.hg_direction_from_uniforms(u[2], u[3], dd,
                                                          vol.hg_g)
                w = w * p_sc
                return (x, nd, w), (x, nd, w)
            (pp, _, w), ys = jax.lax.scan(step, (p, d, jnp.ones(N)), us)
            return pp
        return f

    marginal("gather (collision row) only", mk_gather_only)
    marginal("+ knots_to_distance + clip", mk_gather_knots)
    marginal("+ weights + 2 ys outputs", mk_full_nohg)
    marginal("+ HG direction + 3 ys outputs", mk_full_hg)


if __name__ == "__main__":
    main()
