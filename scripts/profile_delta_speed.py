"""Delta-sampler throughput after the r3 batching rework: cache-off render
cost of sampler='delta' (batched Woodcock, global vs local majorant, vs
candidate budget) against sampler='collision' on the real cloud.

The pre-batching sequential walk measured ~3.5x slower than collision at
256^2 (docs/PERFORMANCE.md r3). The batched walk replaces delta_null_steps
SEQUENTIAL density gathers per scan step with ONE (steps * n)-row gather,
and delta_majorant='local' cuts the candidate budget ~4x at equal exhaust
probability -- this script puts numbers on both.

Env: SIZE (default 256), FRAMES (default 6), CONFIGS (comma list among
collision,global64,global32,local16,local24).
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

from neuralradiancecaching_tpu import config as cfg_mod
from neuralradiancecaching_tpu.io import assets
from neuralradiancecaching_tpu.models import nrc
from neuralradiancecaching_tpu.render import frame as frame_mod
from neuralradiancecaching_tpu.scene.scene import make_scene

SIZE = int(os.environ.get("SIZE", 256))
FRAMES = int(os.environ.get("FRAMES", 6))
CONFIGS = os.environ.get(
    "CONFIGS", "collision,global64,global32,local24,local16").split(",")

VARIANTS = {
    "collision": dict(sampler="collision"),
    "global64": dict(sampler="delta", delta_majorant="global",
                     delta_null_steps=64),
    "global32": dict(sampler="delta", delta_majorant="global",
                     delta_null_steps=32),
    "local24": dict(sampler="delta", delta_majorant="local",
                    delta_null_steps=24),
    "local16": dict(sampler="delta", delta_majorant="local",
                    delta_null_steps=16),
}


def main():
    base = cfg_mod.progressive_1080p_config()
    base = dataclasses.replace(
        base,
        camera=dataclasses.replace(base.camera, aspect=1.0),
        render=dataclasses.replace(base.render, width=SIZE, height=SIZE,
                                   use_nn=False))
    density, env = assets.load_cloud(), assets.load_env_map()

    for name in CONFIGS:
        kw = VARIANTS[name]
        cfg = dataclasses.replace(
            base, path=dataclasses.replace(base.path, max_bounces=16, **kw))
        scene = make_scene(cfg, density, env)
        np.asarray(scene.coll_field.sum())
        st = nrc.init_state(jax.random.PRNGKey(0), cfg)
        img = frame_mod.render_only_step(st, scene, jax.random.PRNGKey(1),
                                         cfg)
        np.asarray(img.sum())  # compile + warm
        t0 = time.perf_counter()
        for i in range(FRAMES):
            img = frame_mod.render_only_step(st, scene,
                                             jax.random.PRNGKey(2 + i), cfg)
        mean = float(np.asarray(img.mean()))  # sync
        dt = (time.perf_counter() - t0) / FRAMES
        mrays = SIZE * SIZE / dt / 1e6
        print(f"{name:10s} {dt*1e3:8.1f} ms/frame  {mrays:6.2f} Mrays/s "
              f"mean={mean:.4f}", flush=True)


if __name__ == "__main__":
    main()
