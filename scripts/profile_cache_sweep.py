"""Converged-cache-error sweep over Adam lr/beta2 (VERDICT r4 item 8:
cache_rel_err_binned 0.022 -> <= 0.015 at 400 steps).

Each variant trains the production pipeline (frame.train_only_step at the
bench quality config) and reports bench.cache_quality's binned cache error
at 400 and (for survivors) 1000 steps. The quality probe runs under ONE
normalized config (optimizer fields pinned to baseline) so its programs
compile once; only the train program recompiles per variant (lr/betas are
jit constants).

Env: VARIANTS (comma list of names to run; default all), STEPS2 (1000).
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


def base_cfg():
    cfg = cfg_mod.progressive_1080p_config()
    qside = 512
    return dataclasses.replace(
        cfg,
        camera=dataclasses.replace(cfg.camera, aspect=1.0),
        render=dataclasses.replace(cfg.render, width=qside, height=qside,
                                   use_nn=True, query_cap_fraction=0.375))


VARIANTS = {
    # name -> (mlp_opt overrides, mrhe overrides)
    "base":        ({}, {}),
    "b2_995":      ({"beta2": 0.995}, {"beta2": 0.995}),
    "b2_999":      ({"beta2": 0.999}, {"beta2": 0.999}),
    "mrhe_lr2x":   ({}, {"learning_rate": 0.02}),
    "mrhe_lr_half": ({}, {"learning_rate": 0.005}),
    "mlp_lr2x":    ({"learning_rate": 0.002}, {}),
    "mlp_lr2x_b2_995": ({"learning_rate": 0.002, "beta2": 0.995},
                        {"beta2": 0.995}),
}


def main():
    qcfg = base_cfg()
    scene = make_scene(qcfg, assets.load_cloud(), assets.load_env_map())
    np.asarray(scene.coll_field.sum())
    steps2 = int(os.environ.get("STEPS2", 1000))
    names = os.environ.get("VARIANTS")
    names = names.split(",") if names else list(VARIANTS)

    for name in names:
        mlp_o, mrhe_o = VARIANTS[name]
        cfg = dataclasses.replace(
            qcfg,
            mlp_opt=dataclasses.replace(qcfg.mlp_opt, **mlp_o),
            mrhe=dataclasses.replace(qcfg.mrhe, **mrhe_o))
        st = nrc.init_state(jax.random.PRNGKey(0), cfg)
        done = 0
        t0 = time.perf_counter()
        for ckpt in (400, steps2):
            for i in range(done, ckpt):
                st, mse = frame_mod.train_only_step(
                    st, scene, jax.random.PRNGKey(1000 + i), cfg)
            np.asarray(mse)
            done = ckpt
            # probe under the NORMALIZED config: cache_quality only reads
            # walk/query fields, which are identical across variants
            out = bench_mod.cache_quality(qcfg, scene, st)
            print(f"{name:16s} steps {ckpt:5d}  mse={float(mse):9.5f}  "
                  f"cache_rel_err={out['cache_rel_err_binned']:.4f}  "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
