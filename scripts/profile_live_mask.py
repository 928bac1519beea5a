"""Audit the frame-global live mask against exact quadrature optical depth.

The live-ray pack (render/tiled.py:frame_live_pack) never marches rays with
`hit & (tau0 > 1e-4)` false, where tau0 is the BAKED dir-bucketed exit-tau
field (ops/lightfield.py, nearest voxel + bilinear direction) queried at the
AABB entry point: those rays composite as pure env. A ray whose TRUE optical
depth is > 0 but whose baked tau0 reads ~0 is silently biased toward env --
this script quantifies that leak at 1080p for both direction-bucket
resolutions (the (16,32) default and the (32,64) low-bias knob), because the
1080p bench showed the (32,64) mask marks ~4% fewer rays live and the mean
radiance shifts +2.8% (docs/PERFORMANCE.md).

Ground truth: 128-step fixed quadrature entry->exit (ops/volume.transmittance,
the reference's GetTransmittance semantics, nrc-train.comp:1032-1053), chunked
so the (n, S, 3) sample buffer stays small.

Env: W/H (default 1920x1080), STEPS (128), THRESH (1e-4, the mask threshold).
"""

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
from neuralradiancecaching_tpu.ops import lightfield
from neuralradiancecaching_tpu.ops import volume as volume_ops
from neuralradiancecaching_tpu.scene.camera import pixel_rays
from neuralradiancecaching_tpu.scene.scene import make_scene

W = int(os.environ.get("W", 1920))
H = int(os.environ.get("H", 1080))
STEPS = int(os.environ.get("STEPS", 128))
THRESH = float(os.environ.get("THRESH", 1e-4))
CHUNK = 65536


def main():
    base = cfg_mod.progressive_1080p_config()
    base = dataclasses.replace(
        base, render=dataclasses.replace(base.render, width=W, height=H))
    density, env = assets.load_cloud(), assets.load_env_map()

    @jax.jit
    def true_tau(scene, ro, rd):
        vol = base.volume
        entry, exit_p, hit = volume_ops.entry_exit_points(
            ro, rd, vol.box_size, vol.box_center)

        def chunk(args):
            a, b = args
            t = volume_ops.transmittance(scene.density, a, b, STEPS, vol)
            return -jnp.log(jnp.maximum(t, 1e-30))

        n = ro.shape[0]
        pad = (-n) % CHUNK
        a = jnp.pad(entry, ((0, pad), (0, 0)))
        b = jnp.pad(exit_p, ((0, pad), (0, 0)))
        tau = jax.lax.map(chunk, (a.reshape(-1, CHUNK, 3),
                                  b.reshape(-1, CHUNK, 3))).reshape(-1)[:n]
        return entry, hit, tau

    for db in [(16, 32), (32, 64)]:
        cfg = dataclasses.replace(
            base, volume=dataclasses.replace(base.volume,
                                             field_dir_buckets=db))
        scene = make_scene(cfg, density, env)
        np.asarray(scene.env_t_field.sum())  # force the bake
        ro, rd = pixel_rays(scene.camera, W, H)
        entry, hit, tau = true_tau(scene, ro, rd)
        tau0 = lightfield.query_tau_field(scene.env_t_field, entry, rd,
                                          cfg.volume)
        mask = np.asarray(hit & (tau0 > THRESH))
        hit_np = np.asarray(hit)
        tau_np = np.asarray(tau)
        true_live = hit_np & (tau_np > THRESH)
        miss = true_live & ~mask        # biased: marched ray dropped to env
        spur = mask & ~true_live        # harmless: marched for nothing
        absorb = 1.0 - np.exp(-tau_np)  # per-ray absorbed fraction
        n = mask.size
        leak = float(absorb[miss].sum()) / n
        print(f"dirs {db}: mask_live={mask.mean():.4f} "
              f"true_live={true_live.mean():.4f} "
              f"miss={miss.mean():.5f} spurious={spur.mean():.5f} "
              f"miss_max_tau={tau_np[miss].max() if miss.any() else 0.0:.4f} "
              f"leak(mean 1-T over frame)={leak:.6f}", flush=True)


if __name__ == "__main__":
    main()
