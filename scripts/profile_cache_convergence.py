"""Cache quality vs train steps: binned cache-vs-MC-target error at
checkpoints (TPU). Informs the bench's quality_train_steps and the
north-star <=1% trajectory."""

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


def main():
    cfg = cfg_mod.progressive_1080p_config()
    qside = 512
    qcfg = dataclasses.replace(
        cfg,
        camera=dataclasses.replace(cfg.camera, aspect=1.0),
        render=dataclasses.replace(cfg.render, width=qside, height=qside,
                                   use_nn=True, query_cap_fraction=0.375))
    scene = make_scene(qcfg, assets.load_cloud(), assets.load_env_map())
    np.asarray(scene.coll_field.sum())
    st = nrc.init_state(jax.random.PRNGKey(0), qcfg)

    done = 0
    for ckpt in (150, 400, 1000, 2000):
        t0 = time.perf_counter()
        for i in range(done, ckpt):
            st, mse = frame_mod.train_only_step(st, scene,
                                                jax.random.PRNGKey(1000 + i),
                                                qcfg)
        np.asarray(mse)
        done = ckpt
        out = bench_mod.cache_quality(qcfg, scene, st)
        print(f"steps {ckpt:5d}  mse={float(mse):9.4f}  "
              f"cache_rel_err={out['cache_rel_err_binned']:.4f}  "
              f"(bins {out['cache_bins_used']}, "
              f"{time.perf_counter()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
