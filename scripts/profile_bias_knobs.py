"""Localize the collision-field bias (+5.2% vs delta, r3): is it the
~11-deg direction buckets (VolumeConfig.field_dir_buckets, default
(16, 32)) or the 4-knot piecewise-linear CDF inversion? Sets the config
knob (dirs) or patches the module-level knot constants BEFORE any trace,
then reruns the delta-vs-collision protocol of profile_delta_bias.py.

Env: KNOB=dirs2x doubles direction buckets; KNOB=knots8 doubles CDF knots;
KNOB=base reproduces the shipped config.
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from neuralradiancecaching_tpu.utils import setup_cache

setup_cache()

from neuralradiancecaching_tpu.ops import collision

KNOB = os.environ.get("KNOB", "dirs2x")
DIR_BUCKETS = (16, 32)
if KNOB == "dirs2x":
    # direction resolution now ships as a config field
    # (VolumeConfig.field_dir_buckets) -- this experiment used it to pick
    # the default
    DIR_BUCKETS = (32, 64)
elif KNOB == "knots8":
    collision.N_KNOTS = 8
    collision.ROW_WIDTH = 4 + 8
elif KNOB != "base":
    raise SystemExit(f"unknown KNOB {KNOB}")

from neuralradiancecaching_tpu import config as cfg_mod
from neuralradiancecaching_tpu.io import assets
from neuralradiancecaching_tpu.models import nrc
from neuralradiancecaching_tpu.render import frame as frame_mod
from neuralradiancecaching_tpu.scene.scene import make_scene

SIDE, SPP = 256, 64


def accum(cfg, scene, st, spp, key0):
    acc = None
    for i in range(spp):
        img = frame_mod.render_only_step(st, scene,
                                         jax.random.PRNGKey(key0 + i), cfg)
        acc = img if acc is None else acc + img
    return np.asarray(acc / spp)


def main():
    base = cfg_mod.progressive_1080p_config()
    base = dataclasses.replace(
        base,
        camera=dataclasses.replace(base.camera, aspect=1.0),
        render=dataclasses.replace(base.render, width=SIDE, height=SIDE,
                                   use_nn=False))
    density, env = assets.load_cloud(), assets.load_env_map()
    imgs = {}
    for sampler in ("collision", "delta"):
        cfg = dataclasses.replace(
            base, path=dataclasses.replace(base.path, sampler=sampler,
                                           max_bounces=16),
            volume=dataclasses.replace(base.volume,
                                       field_dir_buckets=DIR_BUCKETS))
        scene = make_scene(cfg, density, env)
        np.asarray(scene.coll_field.sum())
        st = nrc.init_state(jax.random.PRNGKey(0), cfg)
        t0 = time.perf_counter()
        a = accum(cfg, scene, st, SPP, 1000)
        b = accum(cfg, scene, st, SPP, 9000)
        print(f"{sampler:10s} mean={a.mean():.5f}/{b.mean():.5f} "
              f"({time.perf_counter()-t0:.0f}s)", flush=True)
        imgs[sampler] = (a, b)

    from neuralradiancecaching_tpu.utils.metrics import noise_subtracted_bias
    ca, cb = imgs["collision"]
    da, db = imgs["delta"]
    bias, floor = noise_subtracted_bias(ca, cb, da, db)
    c_bar, d_bar = (ca + cb) / 2, (da + db) / 2
    print(f"KNOB={KNOB}: bias rel_rmse={bias:.5f} "
          f"mean_delta={(c_bar.mean()-d_bar.mean())/d_bar.mean():+.5f} "
          f"floor={floor:.5f}")


if __name__ == "__main__":
    main()
