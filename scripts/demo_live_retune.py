"""Live mid-run parameter adjustment -- the capability of the reference's
RenderImGui sliders (VolumeData.cpp:116-128, DirLight.cpp:155-166,
HdrEnvMap.cpp:259-279) in the TPU framework (VERDICT r2 item 10 / missing
item 2).

Two tiers, by construction of the architecture:

* LIGHT-STRENGTH tier (env hpm/direct strength, dir/point light strength,
  light color/direction/position): these are TRACED scalars in the Scene
  pytree, so changing them between frames re-uses the compiled frame
  program -- zero recompiles, zero rebakes (the scatter/tau fields bake
  WITHOUT strength; it is applied at query time, ops/lightfield.py).
* FIELD tier (densityFactor, hg_g): these shape the baked fields and the
  compiled program (static config), so a change rebuilds the scene fields
  (~seconds on TPU) and re-jits -- the honest equivalent of the
  reference's live uniform, paid only on the frame that changes it.

Run: python scripts/demo_live_retune.py  (TPU or NRC_PLATFORM=cpu, small)
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("NRC_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["NRC_PLATFORM"])

import jax
import jax.numpy as jnp
import numpy as np

from neuralradiancecaching_tpu.utils import setup_cache

setup_cache()

from neuralradiancecaching_tpu import config as cfg_mod
from neuralradiancecaching_tpu.io import assets
from neuralradiancecaching_tpu.models import nrc
from neuralradiancecaching_tpu.render import frame as frame_mod
from neuralradiancecaching_tpu.scene.scene import make_scene

SIDE = int(os.environ.get("RETUNE_SIZE", 256))


def run_frame(state, scene, key, cfg):
    t0 = time.perf_counter()
    state, out = frame_mod.frame_step(state, scene, key, cfg)
    mse = float(np.asarray(out.mse))  # hard sync
    return state, out, mse, time.perf_counter() - t0


def main():
    cfg = cfg_mod.nrc_online_config(SIDE, SIDE)
    cfg = dataclasses.replace(
        cfg, camera=dataclasses.replace(cfg.camera, aspect=1.0),
        path=dataclasses.replace(cfg.path, sampler="collision"),
        volume=dataclasses.replace(cfg.volume, field_dtype="bfloat16"))
    density, env_img = assets.load_cloud(), assets.load_env_map()
    scene = make_scene(cfg, density, env_img)
    state = nrc.init_state(jax.random.PRNGKey(0), cfg)

    for i in range(3):  # warm + baseline
        state, out, mse, dt = run_frame(state, scene, jax.random.PRNGKey(i),
                                        cfg)
        print(f"frame {i}: {dt*1000:7.1f} ms mse={mse:.4f} "
              f"mean={float(np.asarray(out.image.mean())):.4f}  (baseline)")

    # --- tier 1: env strength slider (traced scene scalar, NO recompile)
    compiles_before = frame_mod.frame_step._cache_size()
    scene = scene._replace(env=scene.env._replace(
        hpm_strength=scene.env.hpm_strength * 2.0,
        direct_strength=scene.env.direct_strength * 2.0))
    for i in range(3, 5):
        state, out, mse, dt = run_frame(state, scene, jax.random.PRNGKey(i),
                                        cfg)
        print(f"frame {i}: {dt*1000:7.1f} ms mse={mse:.4f} "
              f"mean={float(np.asarray(out.image.mean())):.4f}  "
              f"(env strength x2, live)")
    assert frame_mod.frame_step._cache_size() == compiles_before, \
        "strength retune must not recompile"
    print(f"  -> env-strength change reused the compiled program "
          f"({compiles_before} cached)")

    # --- tier 2: densityFactor slider (re-bake fields + re-jit)
    t0 = time.perf_counter()
    cfg = dataclasses.replace(
        cfg, volume=dataclasses.replace(cfg.volume, density_factor=0.6))
    scene = make_scene(cfg, density, env_img)
    np.asarray(scene.coll_field.sum())
    print(f"  -> densityFactor 0.4 -> 0.6: field re-bake "
          f"{time.perf_counter()-t0:.1f}s")
    for i in range(5, 8):
        state, out, mse, dt = run_frame(state, scene, jax.random.PRNGKey(i),
                                        cfg)
        print(f"frame {i}: {dt*1000:7.1f} ms mse={mse:.4f} "
              f"mean={float(np.asarray(out.image.mean())):.4f}  "
              f"(densityFactor 0.6; first frame includes re-jit)")


if __name__ == "__main__":
    main()
