"""NN-mode march split A/B at the shipped 1080p packed operating point
(VERDICT r4 item 3: render 19.7 -> >= 24 Mrays/s).

The coll_phase1_steps/coll_live_fraction knobs exist but default OFF from
an r2 A/B measured at FULL frame width (pre live-pack). At today's packed
width (518k lanes) the split's economics changed: saved full-width slots
shrank 4x less than the writeback scatters did. This script measures

  1. the NN walk's live-lane decay per slot at the bench pose (the cap
     must sit above the slot-p1 live fraction or the march drops rays);
  2. full-frame time for the shipped no-split program vs (p1, frac)
     candidates, pipelined bench-style;
  3. mean radiance per variant (drop detection: a too-small cap changes
     the image, not just the speed).

Env: FRAMES (6), RUNS (3), POINTS ("2:0.5,2:0.375,3:0.25").
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from neuralradiancecaching_tpu.utils import setup_cache

setup_cache()

from neuralradiancecaching_tpu import config as cfg_mod
from neuralradiancecaching_tpu.io import assets
from neuralradiancecaching_tpu.models import nrc
from neuralradiancecaching_tpu.render import frame as frame_mod
from neuralradiancecaching_tpu.render import pathtrace
from neuralradiancecaching_tpu.render.tiled import (frame_env_color,
                                                    frame_live_pack,
                                                    render_banded)
from neuralradiancecaching_tpu.scene.scene import make_scene

W, H, BAND = 1920, 1080, 54


def bench_cfg():
    cfg = cfg_mod.progressive_1080p_config()
    live_frac, ev_mean, qfrac = 0.18975, 0.2545, 0.1417
    pack = float(np.ceil((live_frac * 1.05 + 0.005) / 0.015625) * 0.015625)
    shade_cap = float(np.ceil((ev_mean * 1.05 + 0.01) / 0.015625) * 0.015625)
    return dataclasses.replace(
        cfg,
        camera=dataclasses.replace(cfg.camera, aspect=W / H),
        render=dataclasses.replace(
            cfg.render, width=W, height=H, use_nn=True,
            query_cap_fraction=1.0, shade_cap_fraction=shade_cap,
            live_pack_fraction=pack),
        mlp=dataclasses.replace(cfg.mlp, inference_dtype="bfloat16"))


def main():
    frames = int(os.environ.get("FRAMES", 6))
    runs = int(os.environ.get("RUNS", 3))
    cfg = bench_cfg()
    scene = make_scene(cfg, assets.load_cloud(), assets.load_env_map())
    np.asarray(scene.coll_field.sum())
    st = nrc.init_state(jax.random.PRNGKey(0), cfg)
    for i in range(30):
        st, mse = frame_mod.train_only_step(st, scene,
                                            jax.random.PRNGKey(100 + i), cfg)
    np.asarray(mse)

    # --- 1. NN-walk live decay per slot at the bench pose (packed lanes)
    pack = frame_live_pack(scene, cfg, BAND)
    sel, val, ro_p, rd_p, inv, et_p = pack
    ro_f = ro_p.reshape(-1, 3)
    rd_f = rd_p.reshape(-1, 3)
    et_f = et_p.reshape(-1)

    @jax.jit
    def decay(sc, ro_i, rd_i, et_i, key):
        # replicate the walk's termination structure: a lane is LIVE at
        # slot s if it still marches there (not done). Track via a probe
        # config with collect_events and count valid event slots. Scene
        # passed as an ARG (a closed-over scene embeds the 250 MB field
        # as an HLO constant and blows the remote compile size limit).
        res, ev = pathtrace.trace_path_collision(
            sc, cfg, ro_i, rd_i, key, use_nn=True,
            collect_events=True, entry_tau=et_i)
        w = ev[..., 6].astype(jnp.float32)  # (n, K)
        return jnp.mean((w > 0).astype(jnp.float32), axis=0)

    band_n = BAND * W
    per_band = np.stack(
        [np.asarray(decay(scene, ro_f[i * band_n:(i + 1) * band_n],
                          rd_f[i * band_n:(i + 1) * band_n],
                          et_f[i * band_n:(i + 1) * band_n],
                          jax.random.PRNGKey(7 + i)))
         for i in range(ro_f.shape[0] // band_n)])  # (bands, K)
    live = per_band.mean(axis=0)
    nval = float(np.asarray(val.sum())) / val.shape[0]
    print(f"# packed lanes {ro_f.shape[0]} (valid frac {nval:.3f})")
    print("# live (event-valid) fraction per slot, of packed width:",
          " ".join(f"{v:.4f}" for v in live))
    print("# per-band MAX live per slot (split cap must exceed slot p1):",
          " ".join(f"{v:.4f}" for v in per_band.max(axis=0)))

    # --- 2/3. full-frame A/B
    env_rgb = frame_env_color(scene, cfg)
    baked = nrc.bake(st, cfg)
    np.asarray(env_rgb.sum())

    def time_variant(tag, c):
        pk = frame_live_pack(scene, c, BAND)

        def run(key, sync):
            img = render_banded(st, scene, key, c, band_rows=BAND,
                                env_rgb=env_rgb, baked=baked, pack=pk)
            if sync:
                np.asarray(img.sum())
            return img

        img = run(jax.random.PRNGKey(0), True)
        best = 1e9
        for r in range(runs):
            t0 = time.perf_counter()
            for i in range(frames):
                img = run(jax.random.PRNGKey(1 + i), i == frames - 1)
            best = min(best, (time.perf_counter() - t0) / frames)
        mr = float(np.asarray(img.mean()))
        print(f"{tag:24s} {best * 1000:7.1f} ms/frame "
              f"({W * H / best / 1e6:6.2f} Mrays/s)  mean={mr:.6f}",
              flush=True)

    time_variant("no-split (shipped)", cfg)
    points = os.environ.get("POINTS", "2:0.5,2:0.375,3:0.25")
    for p in points.split(","):
        p1_s, fr_s = p.split(":")
        c = dataclasses.replace(cfg, path=dataclasses.replace(
            cfg.path, coll_phase1_steps=int(p1_s),
            coll_live_fraction=float(fr_s)))
        time_variant(f"split p1={p1_s} frac={fr_s}", c)


if __name__ == "__main__":
    main()
