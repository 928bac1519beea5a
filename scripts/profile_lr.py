"""Is the 0.23 cache-error floor an SGD noise ball? Train, then decay lr."""

import dataclasses
import os
import sys

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
    qcfg = dataclasses.replace(
        cfg,
        camera=dataclasses.replace(cfg.camera, aspect=1.0),
        render=dataclasses.replace(cfg.render, width=512, height=512,
                                   use_nn=True, query_cap_fraction=0.375))
    scene = make_scene(qcfg, assets.load_cloud(), assets.load_env_map())
    np.asarray(scene.coll_field.sum())
    st = nrc.init_state(jax.random.PRNGKey(0), qcfg)

    step_i = 0

    def train(st, c, steps):
        nonlocal step_i
        for _ in range(steps):
            st, mse = frame_mod.train_only_step(st, scene,
                                                jax.random.PRNGKey(step_i),
                                                c)
            step_i += 1
        np.asarray(mse)
        return st, float(np.asarray(mse))

    phases = [(qcfg, 600, "lr 1e-3/1e-2")]
    for mlp_lr, hash_lr, steps in ((3e-4, 3e-3, 600), (1e-4, 1e-3, 600)):
        c = dataclasses.replace(
            qcfg,
            mlp_opt=dataclasses.replace(qcfg.mlp_opt,
                                        learning_rate=mlp_lr),
            mrhe=dataclasses.replace(qcfg.mrhe, learning_rate=hash_lr))
        phases.append((c, steps, f"lr {mlp_lr:g}/{hash_lr:g}"))

    for c, steps, label in phases:
        st, mse = train(st, c, steps)
        out = bench_mod.cache_quality(qcfg, scene, st)
        print(f"{label:18s} (+{steps})  mse={mse:9.4f}  "
              f"cache_rel_err={out['cache_rel_err_binned']:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
