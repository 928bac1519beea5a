"""Sweep the no-NN train-walk split knobs (coll_nonn_phase1_steps x
coll_nonn_live_fraction) on the full benched train step.

The two-phase split shades phase-2 events at packed width (pathtrace.py
prefix_shade), so phase-1 length is now the dominant lane-step cost:
8 steps x 80k lanes = 640k lane-steps vs phase-2's 56 x 5k = 280k at the
shipped (8, 1/16). Shorter phase-1 trades more live lanes into phase-2;
the sweep finds the knee. MSE is printed per leg -- the estimator is
unbiased under any split; only deterministic overflow drops (live lanes
beyond the 1/16 cap) can move it.

Env: PHASE1 (comma list, default "4,6,8,12"), LIVE (default "0.0625,0.125"),
RUNS (default 10).
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("NRC_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["NRC_PLATFORM"])

import numpy as np

from neuralradiancecaching_tpu.utils import setup_cache

setup_cache()

from neuralradiancecaching_tpu import config as cfg_mod
from neuralradiancecaching_tpu.io import assets
from neuralradiancecaching_tpu.models import nrc
from neuralradiancecaching_tpu.render import frame as frame_mod
from neuralradiancecaching_tpu.scene.scene import make_scene

RUNS = int(os.environ.get("RUNS", 10))


def main():
    cfg = cfg_mod.progressive_1080p_config()
    density = assets.load_cloud()
    env_img = assets.load_env_map()
    scene = make_scene(cfg, density, env_img)
    state = nrc.init_state(jax.random.PRNGKey(cfg.seed), cfg)
    key = jax.random.PRNGKey(7)
    print("scene + state ready", flush=True)

    p1s = [int(x) for x in os.environ.get("PHASE1", "4,6,8,12").split(",")]
    lives = [float(x) for x in
             os.environ.get("LIVE", "0.0625,0.125").split(",")]
    for p1 in p1s:
        for lf in lives:
            c = dataclasses.replace(cfg, path=dataclasses.replace(
                cfg.path, coll_nonn_phase1_steps=p1,
                coll_nonn_live_fraction=lf))
            st, mse = frame_mod.train_only_step(state, scene, key, c)
            np.asarray(mse)  # hard sync (compile + run)
            t0 = time.perf_counter()
            for _ in range(RUNS):
                st, mse = frame_mod.train_only_step(state, scene, key, c)
            m = float(np.asarray(mse))
            dt = (time.perf_counter() - t0) / RUNS * 1000
            print(f"p1={p1:3d} live={lf:7.4f}  {dt:7.2f} ms  mse={m:.6f}",
                  flush=True)


if __name__ == "__main__":
    main()
