"""Measure the scatter-field error AT REAL RENDER EVENTS, event-weight
averaged -- the quantity that actually maps to image bias.

profile_sfield_knobs.py samples density-weighted positions x uniform
in-directions and reports -0.5% mean field error at the shipped bake
knobs, yet the delta+field image leg (profile_gt_bias.py) still shows
-2.4% mean vs the unbiased oracle. The gap must live in the event
MEASURE: real events weight positions by path throughput and directions
by chained HG sampling. This probe harvests (pos, dir, weight) from the
real delta walk at the probe camera, then compares the shipped field
lookup F against the cell-integrated oracle O at those events:

    predicted image shading bias ~= sum_e w_e (F_e - O_e) / sum_e w_e O_e

Env: SIDE (256), EVENTS (16384), ORACLE_DIRS (64,128), ORACLE_STEPS 96.
"""

import dataclasses
import os
import sys

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
from neuralradiancecaching_tpu.ops import lightfield
from neuralradiancecaching_tpu.render import pathtrace
from neuralradiancecaching_tpu.scene.camera import pixel_rays
from neuralradiancecaching_tpu.scene.scene import make_scene
from profile_scatter_field_bias import convolved_cell

SIDE = int(os.environ.get("SIDE", 256))
EVENTS = int(os.environ.get("EVENTS", 16384))
ORACLE_DIRS = tuple(int(x) for x in
                    os.environ.get("ORACLE_DIRS", "64,128").split(","))
ORACLE_STEPS = int(os.environ.get("ORACLE_STEPS", 96))


def main():
    base = cfg_mod.progressive_1080p_config()
    base = dataclasses.replace(
        base,
        camera=dataclasses.replace(base.camera, aspect=1.0),
        render=dataclasses.replace(base.render, width=SIDE, height=SIDE,
                                   use_nn=False),
        # f32 fields isolate the bake math from bf16 storage rounding;
        # delta sampler gives the unbiased event distribution
        volume=dataclasses.replace(base.volume, field_dtype="float32"),
        path=dataclasses.replace(base.path, sampler="delta",
                                 max_bounces=16))
    density = assets.load_cloud()
    env_img = jnp.asarray(assets.load_env_map(), jnp.float32)
    scene = make_scene(base, density, env_img)
    vol = base.volume

    ro, rd = pixel_rays(scene.camera, SIDE, SIDE)
    _, ev = pathtrace.trace_path_collision(scene, base, ro, rd,
                                           jax.random.PRNGKey(3),
                                           use_nn=False,
                                           collect_events=True)
    ev = np.asarray(ev.reshape(-1, 7), np.float64)
    w = ev[:, 6]
    valid = w > 0.0
    print(f"events: {valid.sum()} valid of {ev.shape[0]}", flush=True)
    idx = np.nonzero(valid)[0]
    rng = np.random.default_rng(0)
    # weight-proportional subsample (weights re-enter only via selection)
    p = w[idx] / w[idx].sum()
    take = rng.choice(idx, size=min(EVENTS, idx.size), p=p, replace=True)
    pts = jnp.asarray(ev[take, 0:3], jnp.float32)
    dirs = jnp.asarray(ev[take, 3:6], jnp.float32)

    F = np.asarray(lightfield.query_radiance_field(
        scene.env_s_field, pts, dirs, vol), np.float64)
    O = np.asarray(convolved_cell(scene, vol, pts, dirs, env_img,
                                  ORACLE_DIRS, ORACLE_STEPS, vol.hg_g),
                   np.float64)
    om = O.mean()
    d = F - O
    print(f"oracle mean {om:.5f}")
    print(f"event-weighted field error: mean {d.mean() / om:+.5f}  "
          f"rel_rmse {np.sqrt((d ** 2).mean()) / om:.5f}")

    # leg split at the same events: exact-out-dir bake math (B) isolates
    # the out-dir bucketing (F-B) from the bake quadrature (B-O); B at the
    # containing-voxel centers (B_c) splits spatial nearest from out-dir
    qd = base.env_map.scatter_quad_dirs or vol.field_dir_buckets
    steps = base.env_map.scatter_bake_steps or 16
    B = np.asarray(convolved_cell(scene, vol, pts, dirs, env_img,
                                  qd, steps, vol.hg_g), np.float64)
    fs = np.asarray(vol.field_shape)
    size = np.asarray(vol.box_size)
    center = np.asarray(vol.box_center)
    uvw = (np.asarray(pts) - center) / size + 0.5
    ijk = np.clip((uvw * fs).astype(np.int64), 0, fs - 1)
    cpts = jnp.asarray(((ijk + 0.5) / fs - 0.5) * size + center, jnp.float32)
    Bc = np.asarray(convolved_cell(scene, vol, cpts, dirs, env_img,
                                   qd, steps, vol.hg_g), np.float64)
    for name, a, b in [("outdir (F-B_c)", F, Bc),
                       ("spatial (B_c-B)", Bc, B),
                       ("bake quad (B-O)", B, O)]:
        dd = a - b
        print(f"{name:22s} mean {dd.mean() / om:+.5f}  "
              f"rel_rmse {np.sqrt((dd ** 2).mean()) / om:.5f}", flush=True)

    # out-bucket resolution sweep at the same events (the query-side
    # bilinear grid, VolumeConfig.field_out_buckets; row size unchanged)
    from neuralradiancecaching_tpu.ops import lightfield as lf
    for ob in [(8, 16), (16, 32), (24, 48), (32, 64)]:
        vol_ob = dataclasses.replace(vol, field_out_buckets=ob)
        field = lf.build_scatter_field(
            scene.density, env_img, vol_ob, hg_g=vol.hg_g, steps=steps,
            quad_dirs=qd)
        Fo = np.asarray(lf.query_radiance_field(field, pts, dirs, vol_ob),
                        np.float64)
        dd = Fo - O
        rows_mb = field.size * 4 / 1e6
        print(f"out-buckets {ob}: mean {dd.mean() / om:+.5f}  rel_rmse "
              f"{np.sqrt((dd ** 2).mean()) / om:.5f}  ({rows_mb:.0f} MB f32)",
              flush=True)


if __name__ == "__main__":
    main()
