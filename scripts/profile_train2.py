"""A/B the collision train-step knobs at reference settings (TPU)."""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from neuralradiancecaching_tpu.utils import setup_cache

setup_cache()

from neuralradiancecaching_tpu import config as cfg_mod
from neuralradiancecaching_tpu.io import assets
from neuralradiancecaching_tpu.models import nrc
from neuralradiancecaching_tpu.render import frame as frame_mod
from neuralradiancecaching_tpu.render import targets
from neuralradiancecaching_tpu.scene.scene import make_scene


def main():
    base = cfg_mod.progressive_1080p_config()
    scene = make_scene(base, assets.load_cloud(), assets.load_env_map())
    np.asarray(scene.coll_field.sum())
    state = nrc.init_state(jax.random.PRNGKey(0), base)

    def path_variant(name, **kw):
        return (name, dataclasses.replace(
            base, path=dataclasses.replace(base.path, **kw)))

    variants = [
        ("current (nonn split 8/0.5, wrr, cap8)", base),
        path_variant("nonn nosplit", coll_nonn_live_fraction=0.0),
        path_variant("nonn nosplit, dense shade",
                     coll_nonn_live_fraction=0.0, coll_shade_cap=0.0),
        path_variant("nonn nosplit, no weight-RR",
                     coll_nonn_live_fraction=0.0, coll_weight_rr=0.0),
        path_variant("nonn nosplit, cap 4", coll_nonn_live_fraction=0.0,
                     coll_shade_cap=4.0),
    ]
    for name, cfg in variants:
        st = state
        st, mse = frame_mod.train_only_step(st, scene, jax.random.PRNGKey(1),
                                            cfg)
        np.asarray(mse)
        t0 = time.perf_counter()
        for i in range(5):
            st, mse = frame_mod.train_only_step(st, scene,
                                                jax.random.PRNGKey(2 + i),
                                                cfg)
            np.asarray(mse)
        dt = (time.perf_counter() - t0) / 5
        print(f"{name:42s} {dt*1000:7.1f} ms  mse={float(mse):.4f}",
              flush=True)

    # target-gen alone (no backprop) for the winner
    cfg = variants[1][1]
    def gen(k):
        b = targets.generate_train_batch(scene, cfg, k)
        return b.target
    gen(jax.random.PRNGKey(9))
    np.asarray(gen(jax.random.PRNGKey(9)).sum())
    t0 = time.perf_counter()
    for i in range(5):
        np.asarray(gen(jax.random.PRNGKey(10 + i)).sum())
    print(f"{'target gen only (nonn nosplit)':42s} "
          f"{(time.perf_counter()-t0)/5*1000:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
