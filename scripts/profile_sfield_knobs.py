"""Sweep the scatter-field bake knobs (quad_dirs x steps) against the
cell-integrated oracle at event-weighted sample points, and time each bake.

Picks EnvMapConfig.scatter_quad_dirs / scatter_bake_steps defaults: the
env integral is exact per cell (lightfield.env_cell_integrals), so dir
count only resolves the smooth T/HG factors while steps controls the
per-dir transmittance quadrature -- they trade off at constant
dirs*steps bake cost.
"""

import dataclasses
import math
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
from neuralradiancecaching_tpu.ops import lightfield
from neuralradiancecaching_tpu.ops import volume as volume_ops
from neuralradiancecaching_tpu.scene.scene import make_scene
from profile_scatter_field_bias import convolved_cell

PTS = int(os.environ.get("PTS", 1024))
ORACLE_DIRS = tuple(int(x) for x in
                    os.environ.get("ORACLE_DIRS", "64,128").split(","))
ORACLE_STEPS = int(os.environ.get("ORACLE_STEPS", 96))
SWEEP = os.environ.get(
    "SWEEP", "32x64:16 32x64:64 16x32:64 24x48:48 32x64:32 16x32:128")


def main():
    base = cfg_mod.progressive_1080p_config()
    base = dataclasses.replace(
        base, volume=dataclasses.replace(base.volume, field_dtype="float32"))
    vol = base.volume
    density = assets.load_cloud()
    env_img = jnp.asarray(assets.load_env_map(), jnp.float32)
    # scene only for the quantized corner-table density the bakes consume
    scene = make_scene(dataclasses.replace(
        base, env_map=dataclasses.replace(base.env_map,
                                          in_scatter_mode="mc")),
        density, env_img)

    rng = np.random.default_rng(7)
    dgrid = np.asarray(density, np.float64)
    p = dgrid.reshape(-1) / dgrid.sum()
    vox = rng.choice(p.size, size=PTS, p=p)
    gz, gy = dgrid.shape[2], dgrid.shape[1]
    ii = vox // (gy * gz)
    jj = (vox // gz) % gy
    kk = vox % gz
    u = (np.stack([ii, jj, kk], -1) + rng.random((PTS, 3))) \
        / np.array(dgrid.shape)
    size = np.asarray(vol.box_size, np.float64)
    center = np.asarray(vol.box_center, np.float64)
    pts = jnp.asarray((u - 0.5) * size + center, jnp.float32)
    v = rng.normal(size=(PTS, 3))
    sdirs = jnp.asarray(v / np.linalg.norm(v, axis=1, keepdims=True),
                        jnp.float32)

    O = np.asarray(convolved_cell(scene, vol, pts, sdirs, env_img,
                                  ORACLE_DIRS, ORACLE_STEPS, vol.hg_g),
                   np.float64)
    om = O.mean()
    print(f"oracle mean {om:.5f} ({ORACLE_DIRS} dirs, {ORACLE_STEPS} steps)",
          flush=True)

    for spec in SWEEP.split():
        dirs_s, steps_s = spec.split(":")
        qd = tuple(int(x) for x in dirs_s.split("x"))
        steps = int(steps_s)
        t0 = time.perf_counter()
        field = lightfield.build_scatter_field(
            scene.density, env_img, vol, hg_g=vol.hg_g, steps=steps,
            quad_dirs=qd)
        np.asarray(field.sum())  # hard sync (axon block_until_ready quirk)
        bake_s = time.perf_counter() - t0
        F = np.asarray(
            lightfield.query_radiance_field(field, pts, sdirs, vol),
            np.float64)
        d = F - O
        print(f"{spec:12s} bake {bake_s:6.1f}s  mean {d.mean() / om:+.5f}  "
              f"rel_rmse {np.sqrt((d ** 2).mean()) / om:.5f}", flush=True)


if __name__ == "__main__":
    main()
