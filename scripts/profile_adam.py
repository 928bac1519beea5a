"""Cache-quality A/B: optimizer (momentum-SGD vs Adam) x loss (mse vs
relative_l2) x lr, measured as bench.cache_quality's binned converged
error after 400 online train steps @512^2 (TPU). VERDICT r3 item 4."""

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

STEPS = int(os.environ.get("AB_STEPS", 400))


def variant(cfg, name, mlp_kind="momentum", mlp_lr=0.001, mlp_b1=0.5,
            hash_opt="sgd", hash_lr=0.01, loss="mse"):
    c = dataclasses.replace(
        cfg,
        mlp_opt=dataclasses.replace(cfg.mlp_opt, kind=mlp_kind,
                                    learning_rate=mlp_lr, beta1=mlp_b1),
        mrhe=dataclasses.replace(cfg.mrhe, optimizer=hash_opt,
                                 learning_rate=hash_lr),
        train=dataclasses.replace(cfg.train, loss=loss))
    return name, c


def main():
    base = cfg_mod.progressive_1080p_config()
    qside = 512
    base = dataclasses.replace(
        base,
        camera=dataclasses.replace(base.camera, aspect=1.0),
        render=dataclasses.replace(base.render, width=qside, height=qside,
                                   use_nn=True, query_cap_fraction=0.375))
    scene = make_scene(base, assets.load_cloud(), assets.load_env_map())
    np.asarray(scene.coll_field.sum())

    variants = [
        variant(base, "momentum+sgd mse (r2 baseline)"),
        variant(base, "adam+adam mse lr 1e-3/1e-2",
                mlp_kind="adam", mlp_b1=0.9, hash_opt="adam"),
        variant(base, "adam+adam relL2 lr 1e-3/1e-2",
                mlp_kind="adam", mlp_b1=0.9, hash_opt="adam",
                loss="relative_l2"),
        variant(base, "adam+adam relL2 lr 5e-3/1e-2",
                mlp_kind="adam", mlp_b1=0.9, mlp_lr=5e-3, hash_opt="adam",
                loss="relative_l2"),
        variant(base, "adam+adam mse lr 5e-3/1e-2",
                mlp_kind="adam", mlp_b1=0.9, mlp_lr=5e-3, hash_opt="adam"),
    ]
    for name, c in variants:
        t0 = time.perf_counter()
        st = nrc.init_state(jax.random.PRNGKey(0), c)
        for i in range(STEPS):
            st, mse = frame_mod.train_only_step(
                st, scene, jax.random.PRNGKey(1000 + i), c)
        np.asarray(mse)
        out = bench_mod.cache_quality(c, scene, st)
        print(f"{name:42s} mse={float(mse):9.4f} "
              f"rel_err={out['cache_rel_err_binned']:.4f} "
              f"({time.perf_counter()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
