"""Cache-quality A/B over model variants: output ReLU on/off (quirk 5)."""

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
    base = cfg_mod.progressive_1080p_config()
    qbase = dataclasses.replace(
        base,
        camera=dataclasses.replace(base.camera, aspect=1.0),
        render=dataclasses.replace(base.render, width=512, height=512,
                                   use_nn=True, query_cap_fraction=0.375))
    scene = make_scene(qbase, assets.load_cloud(), assets.load_env_map())
    np.asarray(scene.coll_field.sum())

    variants = [
        ("relative_l2, lr x30",
         dataclasses.replace(
             qbase,
             train=dataclasses.replace(qbase.train, loss="relative_l2"),
             mlp_opt=dataclasses.replace(qbase.mlp_opt,
                                         learning_rate=0.03),
             mrhe=dataclasses.replace(qbase.mrhe, learning_rate=0.3))),
        ("relative_l2, lr x10",
         dataclasses.replace(
             qbase,
             train=dataclasses.replace(qbase.train, loss="relative_l2"),
             mlp_opt=dataclasses.replace(qbase.mlp_opt,
                                         learning_rate=0.01),
             mrhe=dataclasses.replace(qbase.mrhe, learning_rate=0.1))),
    ]
    for label, qcfg in variants:
        st = nrc.init_state(jax.random.PRNGKey(0), qcfg)
        for i in range(600):
            st, mse = frame_mod.train_only_step(st, scene,
                                                jax.random.PRNGKey(7000 + i),
                                                qcfg)
        np.asarray(mse)
        out = bench_mod.cache_quality(qcfg, scene, st)
        print(f"{label:38s} mse={float(np.asarray(mse)):9.4f}  "
              f"cache_rel_err={out['cache_rel_err_binned']:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
