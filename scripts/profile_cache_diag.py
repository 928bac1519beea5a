"""Diagnose the plateaued cache error: binned cache-vs-target error at
TRAIN vertices vs at RENDER query points (distribution shift vs underfit),
plus per-bin detail."""

import dataclasses
import os
import sys

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
from neuralradiancecaching_tpu.render import pathtrace, targets
from neuralradiancecaching_tpu.scene.camera import pixel_rays
from neuralradiancecaching_tpu.scene.scene import make_scene


def binned_err(qcfg, scene, st, pos, d, val, samples=32, bins=16,
               label=""):
    one_chunk = jax.jit(
        lambda sc, p, dd, k: targets.cache_targets_collision(
            sc, qcfg, p, dd, k, samples=samples))
    chunk = 2048
    pc = pos.reshape(-1, chunk, 3)
    dc = d.reshape(-1, chunk, 3)
    ks = jax.random.split(jax.random.PRNGKey(12), pc.shape[0])
    target = jnp.concatenate(
        [one_chunk(scene, pc[i], dc[i], ks[i]) for i in range(pc.shape[0])])

    baked = nrc.bake(st, qcfg)
    pred = jax.jit(lambda s, b, p, dd: nrc.query_baked(s, b, p, dd, qcfg))(
        st, baked, pos, d)

    ctr = jnp.asarray(qcfg.volume.box_center)
    bits = ((pos > ctr).astype(jnp.int32) * jnp.asarray([1, 2, 4])).sum(-1)
    bin_id = np.asarray(jnp.where(val, bits + 8 * (d[:, 2] > 0), bins))
    t = np.asarray(target)
    p = np.asarray(pred)
    v = np.asarray(val)
    rows = []
    t_ms, p_ms = [], []
    for b in range(bins):
        m = (bin_id == b) & v
        if m.sum() < 64:
            continue
        t_m = t[m].mean(0)
        p_m = p[m].mean(0)
        rows.append((b, int(m.sum()), float(np.linalg.norm(t_m)),
                     float(np.linalg.norm(p_m - t_m)
                           / max(np.linalg.norm(t_m), 1e-9))))
        t_ms.append(t_m)
        p_ms.append(p_m)
    t_ms, p_ms = np.array(t_ms), np.array(p_ms)
    rel = float(np.sqrt(np.mean((p_ms - t_ms) ** 2))
                / np.sqrt(np.mean(t_ms ** 2)))
    print(f"[{label}] overall binned rel err: {rel:.4f}", flush=True)
    for b, cnt, tn, e in rows:
        print(f"  bin {b:2d}  n={cnt:5d}  |target|={tn:8.3f} "
              f"rel={e:.3f}", flush=True)
    # per-point (noisy, upper bound)
    pv = p[v]
    tv = t[v]
    pp = float(np.mean(np.linalg.norm(pv - tv, axis=1))
               / np.mean(np.linalg.norm(tv, axis=1)))
    print(f"[{label}] per-point mean rel err (incl. 32-sample MC noise): "
          f"{pp:.3f}", flush=True)


def main():
    qside = 512
    cfg = cfg_mod.progressive_1080p_config()
    qcfg = dataclasses.replace(
        cfg,
        camera=dataclasses.replace(cfg.camera, aspect=1.0),
        render=dataclasses.replace(cfg.render, width=qside, height=qside,
                                   use_nn=True, query_cap_fraction=0.375))
    scene = make_scene(qcfg, assets.load_cloud(), assets.load_env_map())
    np.asarray(scene.coll_field.sum())
    st = nrc.init_state(jax.random.PRNGKey(0), qcfg)
    for i in range(400):
        st, mse = frame_mod.train_only_step(st, scene,
                                            jax.random.PRNGKey(1000 + i),
                                            qcfg)
    print(f"trained 400 steps, mse={float(np.asarray(mse)):.4f}",
          flush=True)

    n_points = 8192
    # render-query distribution
    @jax.jit
    def probe_points(sc, key):
        ro, rd = pixel_rays(sc.camera, qside, qside)
        res = pathtrace.trace_path(sc, qcfg, ro, rd, key, use_nn=True)
        perm = jax.random.permutation(jax.random.fold_in(key, 1),
                                      ro.shape[0])
        mask_p = jnp.take(res.query_weight > 0.0, perm)
        sel_p, val = compact.compact_select(mask_p, n_points)
        sel = jnp.take(perm, sel_p)
        return (jnp.take(res.query_pos, sel, axis=0),
                jnp.take(res.query_dir, sel, axis=0), val)

    pos, d, val = probe_points(scene, jax.random.PRNGKey(11))
    binned_err(qcfg, scene, st, pos, d, val, label="render queries")

    # train-vertex distribution (same grid the optimizer saw)
    @jax.jit
    def train_points(sc, key):
        ro, rd = pixel_rays(sc.camera, 128, 64)
        p, dd = targets.choose_train_vertices_collision(sc, qcfg, ro, rd,
                                                        key)
        return p, dd

    tp, td = train_points(scene, jax.random.PRNGKey(13))
    val_t = jnp.ones((tp.shape[0],), bool)
    binned_err(qcfg, scene, st, tp, td, val_t, label="train vertices")


if __name__ == "__main__":
    main()
