"""Decompose the collision sampler's +1.6% image brightness bias
(profile_gt_bias.py leg B) at the event level -- no renders.

The collision walk's only approximation is the baked tau/knot rows
(ops/collision.py): tau_total enters twice, as the primary see-through
T0 = exp(-tau0) and as the per-event branch weight p_sc = 1 - exp(-tau).
Both are evaluated from the NEAREST-voxel row (profile anchored at the
voxel center) with (theta, phi)-bilinear tau. This probe compares, at
the two real query distributions:

  primary rays  (camera entry points, live mask on):
      E[exp(-tau_f)] vs E[exp(-tau_x)]   -- the T0/env-composite bias
      E[1-exp(-tau_f)] vs exact           -- the first-event branch bias
  interior events (harvested from an unbiased delta walk):
      E[1-exp(-tau_f)] vs exact           -- the continuation branch bias

tau_f = collision-field bilinear tau; tau_x = 96-step quadrature from
the exact point. Also sweeps field_dir_buckets (32,64)->(64,128) to
price the resolution knob.

Env: SIDE (256), EVENTS (16384), STEPS (96), BUCKETS sweep list.
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
from neuralradiancecaching_tpu.ops import collision, volume as volume_ops
from neuralradiancecaching_tpu.render import pathtrace
from neuralradiancecaching_tpu.scene.camera import pixel_rays
from neuralradiancecaching_tpu.scene.scene import make_scene

SIDE = int(os.environ.get("SIDE", 256))
EVENTS = int(os.environ.get("EVENTS", 16384))
STEPS = int(os.environ.get("STEPS", 96))
BUCKETS = os.environ.get("BUCKETS", "32,64 64,128").split()


def exact_tau(scene, vol, pos, d):
    _, exit_p, _ = volume_ops.entry_exit_points(pos, d, vol.box_size,
                                                vol.box_center)
    t = volume_ops.transmittance(scene.density, pos, exit_p, STEPS, vol)
    return -jnp.log(jnp.maximum(t, 1e-20))


def report(name, tau_f, tau_x):
    tf = np.asarray(tau_f, np.float64)
    tx = np.asarray(tau_x, np.float64)
    T_f, T_x = np.exp(-tf), np.exp(-tx)
    p_f, p_x = 1 - T_f, 1 - T_x
    print(f"{name:18s} E[T] {T_f.mean():.5f} vs {T_x.mean():.5f} "
          f"({(T_f.mean() / T_x.mean() - 1) * 100:+.2f}%)   "
          f"E[p_sc] {p_f.mean():.5f} vs {p_x.mean():.5f} "
          f"({(p_f.mean() / p_x.mean() - 1) * 100:+.2f}%)", flush=True)


def main():
    base = cfg_mod.progressive_1080p_config()
    base = dataclasses.replace(
        base,
        camera=dataclasses.replace(base.camera, aspect=1.0),
        render=dataclasses.replace(base.render, width=SIDE, height=SIDE,
                                   use_nn=False),
        volume=dataclasses.replace(base.volume, field_dtype="float32"),
        path=dataclasses.replace(base.path, sampler="delta",
                                 max_bounces=16))
    density = assets.load_cloud()
    env_img = jnp.asarray(assets.load_env_map(), jnp.float32)
    scene = make_scene(base, density, env_img)
    vol = base.volume

    # primary rays: entry points of rays that hit the box
    ro, rd = pixel_rays(scene.camera, SIDE, SIDE)
    entry, _, hit = volume_ops.entry_exit_points(ro, rd, vol.box_size,
                                                 vol.box_center)
    hit_np = np.asarray(hit)
    idx = np.nonzero(hit_np)[0]
    rng = np.random.default_rng(0)
    take = rng.choice(idx, size=min(EVENTS, idx.size), replace=False)
    p_pri = jnp.take(entry, jnp.asarray(take), axis=0)
    d_pri = jnp.take(rd, jnp.asarray(take), axis=0)

    # interior events from the unbiased delta walk, weight-sampled
    _, ev = pathtrace.trace_path_collision(scene, base, ro, rd,
                                           jax.random.PRNGKey(3),
                                           use_nn=False, collect_events=True)
    ev = np.asarray(ev.reshape(-1, 7), np.float64)
    w = ev[:, 6]
    vmask = w > 0.0
    iidx = np.nonzero(vmask)[0]
    p = w[iidx] / w[iidx].sum()
    itake = rng.choice(iidx, size=min(EVENTS, iidx.size), p=p, replace=True)
    p_int = jnp.asarray(ev[itake, 0:3], jnp.float32)
    d_int = jnp.asarray(ev[itake, 3:6], jnp.float32)

    tau_x_pri = exact_tau(scene, vol, p_pri, d_pri)
    tau_x_int = exact_tau(scene, vol, p_int, d_int)
    # anchor split: exact tau FROM THE CONTAINING-VOXEL CENTER along the
    # same dirs -- field-vs-this is angular/bake error; this-vs-exact-pos
    # is the anchor (profile-origin) error the row could correct
    fs = np.asarray(vol.field_shape)
    size = np.asarray(vol.box_size)
    center = np.asarray(vol.box_center)

    def vox_centers(p):
        uvw = (np.asarray(p) - center) / size + 0.5
        ijk = np.clip((uvw * fs).astype(np.int64), 0, fs - 1)
        return jnp.asarray(((ijk + 0.5) / fs - 0.5) * size + center,
                           jnp.float32)

    tau_c_pri = exact_tau(scene, vol, vox_centers(p_pri), d_pri)
    tau_c_int = exact_tau(scene, vol, vox_centers(p_int), d_int)
    np.asarray(tau_x_pri.sum())
    print("exact taus done", flush=True)
    report("ANCHOR pri (c vs x)", tau_c_pri, tau_x_pri)
    report("ANCHOR int (c vs x)", tau_c_int, tau_x_int)

    for spec in BUCKETS:
        db = tuple(int(x) for x in spec.split(","))
        vol_b = dataclasses.replace(vol, field_dir_buckets=db)
        t0 = time.perf_counter()
        cfield = collision.build_collision_field(
            scene.density, vol_b, steps=base.path.collision_field_steps)
        np.asarray(cfield.sum())
        print(f"--- field_dir_buckets {db} (bake "
              f"{time.perf_counter() - t0:.0f}s) ---", flush=True)
        tau_f_pri, _ = collision.query_collision_rows(cfield, p_pri, d_pri,
                                                      vol_b)
        tau_f_int, _ = collision.query_collision_rows(cfield, p_int, d_int,
                                                      vol_b)
        report("primary (entry)", tau_f_pri, tau_x_pri)
        report("interior (events)", tau_f_int, tau_x_int)


if __name__ == "__main__":
    main()
