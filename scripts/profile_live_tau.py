"""Live-mask entry-tau threshold probe (RenderConfig.live_tau_threshold).

The baked dir-bucketed tau field never underestimates (leak audit,
docs/PERFORMANCE.md), so a lane dropped at threshold T has true entry
optical depth <= T and the pure-env composite it gets instead errs by
|(1 - T0) * env - E[scatter]| <= (1 - exp(-T)) * max(env, L_in) per lane.

Per threshold this prints:
  * the live fraction (the row-count lever: march + query + shade rows
    all scale with it),
  * the frame-relative bias BOUND: mean over newly-dropped lanes of
    (1 - exp(-tau0)) * env luminance, over the frame's mean luminance --
    an upper bound on the transmittance side of the error (in-scatter
    partially cancels it),
and then times the packed banded render at each candidate (the pack cap
re-probed per threshold, same 1/64 rounding as bench.py).

Env: TAUS (comma list, default "1e-4,0.005,0.02,0.05"), RUNS (default 8),
W/H (default 1920/1080).
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
from neuralradiancecaching_tpu.ops import envmap as envmap_ops
from neuralradiancecaching_tpu.ops import lightfield
from neuralradiancecaching_tpu.ops import volume as vol_ops
from neuralradiancecaching_tpu.render import frame as frame_mod
from neuralradiancecaching_tpu.render.tiled import (frame_env_color,
                                                    frame_live_pack,
                                                    render_banded)
from neuralradiancecaching_tpu.scene.camera import pixel_rays
from neuralradiancecaching_tpu.scene.scene import make_scene

RUNS = int(os.environ.get("RUNS", 8))
W = int(os.environ.get("W", 1920))
H = int(os.environ.get("H", 1080))
BANDS = [int(x) for x in os.environ.get("BANDS", "54").split(",")]
TAUS = [float(x) for x in
        os.environ.get("TAUS", "1e-4,0.005,0.02,0.05").split(",")]


def main():
    base = cfg_mod.progressive_1080p_config()
    # bench operating point (bench.py cap formulas; qfrac/ev probes cached)
    ev_mean = 0.2545
    shade_cap = float(np.ceil((ev_mean * 1.05 + 0.01) / 0.015625) * 0.015625)
    base = dataclasses.replace(
        base,
        camera=dataclasses.replace(base.camera, aspect=W / H),
        render=dataclasses.replace(base.render, width=W, height=H,
                                   use_nn=True, query_cap_fraction=1.0,
                                   shade_cap_fraction=shade_cap),
        mlp=dataclasses.replace(base.mlp, inference_dtype="bfloat16"))
    scene = make_scene(base, assets.load_cloud(), assets.load_env_map())
    state = nrc.init_state(jax.random.PRNGKey(0), base)
    for i in range(3):
        state, _ = frame_mod.train_only_step(state, scene,
                                             jax.random.PRNGKey(100 + i),
                                             base)
    print("scene + state ready", flush=True)

    ro, rd = pixel_rays(scene.camera, W, H)
    entry_p, _, hit = vol_ops.entry_exit_points(ro, rd, base.volume.box_size,
                                                base.volume.box_center)
    tau0 = np.asarray(lightfield.query_tau_field(scene.env_t_field, entry_p,
                                                 rd, base.volume))
    hit = np.asarray(hit)
    env = np.asarray(envmap_ops.sample_direct(scene.env, rd, hpm=False))
    env_lum = env.mean(axis=-1)

    # frame mean luminance for normalization: one quick packed render
    cfg0 = base
    env_rgb = frame_env_color(scene, cfg0)
    baked = nrc.bake(state, cfg0)
    frame_lum = None

    for tau in TAUS:
        live = hit & (tau0 > tau)
        frac = float(live.mean())
        dropped = hit & (tau0 > 1e-4) & ~live
        bound = float(((1.0 - np.exp(-tau0)) * env_lum)[dropped].sum())
        cap = min(1.0, float(np.ceil((frac * 1.05 + 0.005) / 0.015625)
                             * 0.015625))
        for band in BANDS:
            lanes = -(-int(W * H * cap) // (band * W)) * band * W
            cfg = dataclasses.replace(base, render=dataclasses.replace(
                base.render, live_pack_fraction=cap, live_tau_threshold=tau))
            pack = frame_live_pack(scene, cfg, band)
            img = render_banded(state, scene, jax.random.PRNGKey(7), cfg,
                                band_rows=band, env_rgb=env_rgb, baked=baked,
                                pack=pack)
            np.asarray(img.sum())
            t0 = time.perf_counter()
            for i in range(RUNS):
                img = render_banded(state, scene, jax.random.PRNGKey(10 + i),
                                    cfg, band_rows=band, env_rgb=env_rgb,
                                    baked=baked, pack=pack)
            m = float(np.asarray(img.mean()))
            dt = (time.perf_counter() - t0) / RUNS
            if frame_lum is None:
                frame_lum = m
            print(f"T={tau:<8g} band={band:<3d} live_frac={frac:.4f} "
                  f"cap={cap:.4f} lanes={lanes} {dt * 1000:7.1f} ms/frame "
                  f"({W * H / dt / 1e6:6.2f} Mrays/s) mean={m:.6f} "
                  f"bias_bound={bound / (frame_lum * W * H):.2e}",
                  flush=True)


if __name__ == "__main__":
    main()
