"""Second converged-cache-error sweep (VERDICT r4 item 8), anchored to the
BENCH protocol: trains on the 16:9 bench scene with the bench's key stream
(1000+i) and probes with bench.cache_quality under the bench qcfg -- the
exact channel that produced BENCH_r04's cache_rel_err_binned 0.0223 --
so the numbers are comparable to the VERDICT target (<= 0.015 at 400).

Variants: the round-1 sweep's winners (profile_cache_sweep.py: mlp lr 2e-3
+ beta2 0.995 best at both 400 and 1000 on the square scene) plus the r5
lr-decay schedule (OptimizerConfig.lr_decay_steps).

Env: VARIANTS, STEPS2 (1000).
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

import bench as bench_mod
from neuralradiancecaching_tpu import config as cfg_mod
from neuralradiancecaching_tpu.io import assets
from neuralradiancecaching_tpu.models import nrc
from neuralradiancecaching_tpu.render import frame as frame_mod
from neuralradiancecaching_tpu.scene.scene import make_scene

W, H = 1920, 1080

VARIANTS = {
    # name -> (mlp_opt overrides, mrhe overrides)
    "anchor": ({}, {}),
    "win":    ({"learning_rate": 0.002, "beta2": 0.995}, {"beta2": 0.995}),
    "win_dec": ({"learning_rate": 0.002, "beta2": 0.995,
                 "lr_decay_steps": 400, "lr_decay_factor": 0.5},
                {"beta2": 0.995, "lr_decay_steps": 400,
                 "lr_decay_factor": 0.5}),
    "anchor_dec": ({"lr_decay_steps": 400, "lr_decay_factor": 0.5},
                   {"lr_decay_steps": 400, "lr_decay_factor": 0.5}),
    # + the square-scene sweep's other winner: mrhe lr halving (best
    # single knob at 1000 steps there), combined with the mlp winners
    "win_half": ({"learning_rate": 0.002, "beta2": 0.995},
                 {"learning_rate": 0.005, "beta2": 0.995}),
    "win_half_dec": ({"learning_rate": 0.002, "beta2": 0.995,
                      "lr_decay_steps": 600, "lr_decay_factor": 0.5},
                     {"learning_rate": 0.005, "beta2": 0.995,
                      "lr_decay_steps": 600, "lr_decay_factor": 0.5}),
}


def main():
    base = cfg_mod.progressive_1080p_config()
    base = dataclasses.replace(
        base,
        camera=dataclasses.replace(base.camera, aspect=W / H),
        render=dataclasses.replace(base.render, width=W, height=H,
                                   use_nn=True))
    scene = make_scene(base, assets.load_cloud(), assets.load_env_map())
    np.asarray(scene.coll_field.sum())
    qside = 512
    qcfg = dataclasses.replace(
        base,
        camera=dataclasses.replace(base.camera, aspect=1.0),
        render=dataclasses.replace(base.render, width=qside, height=qside,
                                   use_nn=True, query_cap_fraction=0.375))
    steps2 = int(os.environ.get("STEPS2", 1000))
    names = os.environ.get("VARIANTS")
    names = names.split(",") if names else list(VARIANTS)

    for name in names:
        mlp_o, mrhe_o = VARIANTS[name]
        cfg = dataclasses.replace(
            base,
            mlp_opt=dataclasses.replace(base.mlp_opt, **mlp_o),
            mrhe=dataclasses.replace(base.mrhe, **mrhe_o))
        st = nrc.init_state(jax.random.PRNGKey(0), cfg)
        done = 0
        t0 = time.perf_counter()
        for ckpt in (400, steps2):
            for i in range(done, ckpt):
                st, mse = frame_mod.train_only_step(
                    st, scene, jax.random.PRNGKey(1000 + i), cfg)
            np.asarray(mse)
            done = ckpt
            out = bench_mod.cache_quality(qcfg, scene, st)
            print(f"{name:12s} steps {ckpt:5d}  mse={float(mse):9.5f}  "
                  f"cache_rel_err={out['cache_rel_err_binned']:.4f}  "
                  f"(bins {out['cache_bins_used']}, "
                  f"{time.perf_counter() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
