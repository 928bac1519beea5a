"""Marginal per-step march cost: scan length 8 vs 40 differencing removes
the ~30 ms fixed per-dispatch floor of the axon tunnel.

Variants:
  gather-only      -- density_at + trivial state
  fullstate        -- the real trace_path step() machinery (no two-phase)
  tau-row          -- one tau-field row gather per step (16 B bilinear row)
  tau+hg           -- tau row + HG direction sampling + small state

Run alone.
"""

import dataclasses
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
from neuralradiancecaching_tpu.ops import lightfield
from neuralradiancecaching_tpu.ops import phase as phase_ops
from neuralradiancecaching_tpu.ops import volume as vol_ops
from neuralradiancecaching_tpu.render import pathtrace
from neuralradiancecaching_tpu.scene.camera import pixel_rays
from neuralradiancecaching_tpu.scene.scene import make_scene

N = 1920 * 54


def bench_pair(name, make_fn, *args, reps=5, lens=(8, 24)):
    fs = [make_fn(L) for L in lens]
    for f in fs:
        np.asarray(jax.tree_util.tree_leaves(f(*args))[0].sum())

    def run(f):
        t0 = time.perf_counter()
        for _ in range(reps):
            np.asarray(jax.tree_util.tree_leaves(f(*args))[0].sum())
        return (time.perf_counter() - t0) / reps

    ds = [run(f) for f in fs]
    per_step = (ds[1] - ds[0]) / (lens[1] - lens[0])
    print(f"{name:24s} len{lens[0]} {ds[0]*1e3:7.1f} ms  "
          f"len{lens[1]} {ds[1]*1e3:7.1f} ms  "
          f"-> {per_step*1e3:6.2f} ms/step ({N/per_step/1e6:6.1f} M/s)",
          flush=True)


def main():
    cfg = cfg_mod.progressive_1080p_config()
    scene = make_scene(cfg, assets.load_cloud(), assets.load_env_map())
    vol = cfg.volume
    ro, rd = pixel_rays(scene.camera, 1920, 54)
    pos = ro + rd * 80.0
    key = jax.random.PRNGKey(0)

    def mk_gather(length):
        @jax.jit
        def f(p):
            def body(c, _):
                d = vol_ops.density_at(scene.density, c, vol)
                return c + d[:, None] * 0.01, None
            c, _ = jax.lax.scan(body, p, None, length=length)
            return c
        return f

    def mk_tau(length):
        @jax.jit
        def f(p):
            def body(c, _):
                t = lightfield.query_tau_field(scene.env_t_field, c, rd, vol)
                return c + t[:, None] * 0.01, None
            c, _ = jax.lax.scan(body, p, None, length=length)
            return c
        return f

    def mk_tau_hg(length):
        @jax.jit
        def f(p):
            u = jax.random.uniform(key, (length, 3, N))

            def body(carry, us):
                c, d = carry
                t = lightfield.query_tau_field(scene.env_t_field, c, d, vol)
                nd = phase_ops.hg_direction_from_uniforms(us[0], us[1], d,
                                                          vol.hg_g)
                scat = t > 0.3
                d2 = jnp.where(scat[:, None], nd, d)
                c2 = c + d2 * (us[2] * t)[:, None]
                return (c2, d2), None
            (c, _), _ = jax.lax.scan(body, (p, rd), u)
            return c
        return f

    def mk_fullstate(length):
        c2 = dataclasses.replace(
            cfg, path=dataclasses.replace(cfg.path, max_bounces=length,
                                          march_phase1_steps=0))

        @jax.jit
        def f(p):
            res = pathtrace.trace_path(scene, c2, p, rd,
                                       jax.random.PRNGKey(1), use_nn=True)
            return res.scattered
        return f

    bench_pair("density gather-only", mk_gather, pos)
    bench_pair("tau-row gather-only", mk_tau, pos)
    bench_pair("tau + HG + state", mk_tau_hg, pos)
    bench_pair("fullstate trace_path", mk_fullstate, ro, lens=(8, 24))


if __name__ == "__main__":
    main()
