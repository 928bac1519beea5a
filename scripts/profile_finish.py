"""Break down the frame-global deferred finish at 1080p (TPU):
event shade pack vs cache query vs env composite."""

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
from neuralradiancecaching_tpu.models import nrc
from neuralradiancecaching_tpu.ops import compact
from neuralradiancecaching_tpu.ops import envmap as envmap_ops
from neuralradiancecaching_tpu.render import pathtrace
from neuralradiancecaching_tpu.render.tiled import _bands_program
from neuralradiancecaching_tpu.scene.camera import pixel_rays
from neuralradiancecaching_tpu.scene.scene import make_scene

W, H, BAND = 1920, 1080, 54


def timeit(name, fn, *args):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].sum())
    t0 = time.perf_counter()
    for _ in range(3):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].sum())
    print(f"{name:36s} {(time.perf_counter()-t0)/3*1000:8.1f} ms",
          flush=True)


def main():
    cfg = cfg_mod.progressive_1080p_config()
    cfg = dataclasses.replace(
        cfg,
        camera=dataclasses.replace(cfg.camera, aspect=W / H),
        render=dataclasses.replace(cfg.render, width=W, height=H,
                                   query_cap_fraction=0.25,
                                   shade_cap_fraction=0.5))
    scene = make_scene(cfg, assets.load_cloud(), assets.load_env_map())
    np.asarray(scene.coll_field.sum())
    state = nrc.init_state(jax.random.PRNGKey(0), cfg)
    n = W * H

    rgb, trans, qp, qd, qw, ev = _bands_program(scene, jax.random.PRNGKey(1),
                                                cfg, BAND)
    rgb = rgb.reshape(-1, 3)
    trans = trans.reshape(-1)
    qp, qd = qp.reshape(-1, 3), qd.reshape(-1, 3)
    qw = qw.reshape(-1)
    ev = ev.reshape((ev.shape[0] * ev.shape[1],) + ev.shape[2:])
    np.asarray(rgb.sum())
    baked = nrc.bake(state, cfg)
    np.asarray(baked.sum())

    k = ev.shape[1]
    cap_e = max(1024, int(n * cfg.render.shade_cap_fraction))
    cap_q = 12 * 32768

    @jax.jit
    def shade_pack_only(ev):
        w_nk = ev[:, :, 6]
        counts = jnp.sum((w_nk > 0.0).astype(jnp.int32), axis=1)
        row, slot, val = compact.compact_prefix(counts, cap_e)
        idx = row * k + jnp.minimum(slot, k - 1)
        rows = jnp.take(ev.reshape(n * k, 7), idx, axis=0)
        return rows, row, val

    timeit("event pack only", shade_pack_only, ev)

    @jax.jit
    def shade_full(ev):
        w_nk = ev[:, :, 6]
        counts = jnp.sum((w_nk > 0.0).astype(jnp.int32), axis=1)
        row, slot, val = compact.compact_prefix(counts, cap_e)
        idx = row * k + jnp.minimum(slot, k - 1)
        rows = jnp.take(ev.reshape(n * k, 7), idx, axis=0)
        light = pathtrace.trace_scene(scene, cfg, rows[:, 0:3], rows[:, 3:6],
                                      jax.random.PRNGKey(0),
                                      cfg.env_map.n_samples)
        contrib = jnp.where(val[:, None], rows[:, 6:7] * light, 0.0)
        seg = jnp.where(val, row, n)
        return jax.ops.segment_sum(contrib, seg, num_segments=n + 1,
                                   indices_are_sorted=True)[:n]

    timeit("event pack + shade + segsum", shade_full, ev)

    @jax.jit
    def query_only(qp, qd, qw, baked):
        has_q = qw > 0.0
        sel, val = compact.compact_select(has_q, cap_q)
        p = jnp.take(qp, sel, axis=0).reshape(-1, 32768, 3)
        d = jnp.take(qd, sel, axis=0).reshape(-1, 32768, 3)
        out = jax.lax.map(
            lambda ab: nrc.query_baked(state, baked, ab[0], ab[1], cfg),
            (p, d)).reshape(cap_q, 3)
        out = jnp.where(val[:, None], out, 0.0)
        return compact.scatter_back(n, sel, val, out, 0.0)

    timeit("query pack + MLP + scatter", query_only, qp, qd, qw, baked)

    @jax.jit
    def query_sel_only(qw):
        return compact.compact_select(qw > 0.0, cap_q)

    timeit("query compact_select only", query_sel_only, qw)

    @jax.jit
    def env_composite(rgb, trans):
        ro, rd = pixel_rays(scene.camera, W, H)
        env_color = envmap_ops.sample_direct(scene.env, rd, hpm=False)
        return rgb + trans[:, None] * env_color

    timeit("env composite", env_composite, rgb, trans)


if __name__ == "__main__":
    main()
