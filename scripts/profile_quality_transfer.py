"""Quality-transfer check (VERDICT r3 item 5): the bench measures the
noise-subtracted NN bias at 512^2 and the ground-truth (unbiased oracle)
bias at 256^2. The claim that justifies those sizes is that BOTH biases are
estimator-level, not resolution-level -- every pixel runs the same
collision-walk estimator, so the image-mean bias cannot depend on how many
pixels average it. This probe MEASURES that claim once:

  - NN noise-sub leg at 512^2 (the shipped size) and at 1920x1080
    (the throughput-headline size, rendered banded like the headline);
  - GT noise-sub leg at 256^2 (shipped) and 512^2.

Transfer holds if the large-size numbers match the shipped-size numbers
within their noise floors. Results go to docs/PERFORMANCE.md.

The 1080p NN leg renders through the SHIPPED pipeline (live-ray pack +
uncapped chunked query + env/bake/pack hoists, bench.py's cap formulas
over the cached probe values) -- the plain capped path exceeds HBM by
~107 MB at 1080p regardless of band size, and the shipped path is the
better transfer evidence anyway: it is the estimator the headline runs.

Env: TRAIN (default 400), SPP_NN (8), SPP_REF (32), GT_SPP (16),
LEGS=nn,gt subset, NN_SIZES=512,1080 subset, BAND (band rows, default
54), CKPT (npz path to cache the trained state across invocations,
default /tmp/transfer_state.npz; delete to retrain).
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
from neuralradiancecaching_tpu.render.tiled import render_banded
from neuralradiancecaching_tpu.scene.scene import make_scene
from neuralradiancecaching_tpu.utils.metrics import noise_subtracted_bias

T0 = time.perf_counter()


def t(msg):
    print(f"# t={time.perf_counter() - T0:7.1f}s {msg}", flush=True)


def main():
    train_steps = int(os.environ.get("TRAIN", 400))
    spp_nn = int(os.environ.get("SPP_NN", 8))
    spp_ref = int(os.environ.get("SPP_REF", 32))
    gt_spp = int(os.environ.get("GT_SPP", 16))
    legs = os.environ.get("LEGS", "nn,gt").split(",")

    cfg = cfg_mod.progressive_1080p_config()
    density = assets.load_cloud()
    env_img = assets.load_env_map()
    scene = make_scene(cfg, density, env_img)
    st = nrc.init_state(jax.random.PRNGKey(cfg.seed), cfg)
    ckpt = os.environ.get("CKPT", "/tmp/transfer_state.npz")
    if ckpt and os.path.exists(ckpt):
        from neuralradiancecaching_tpu.io import checkpoint
        st = checkpoint.load(ckpt, st)
        t(f"trained state loaded from {ckpt}")
    else:
        for i in range(train_steps):
            st, _ = frame_mod.train_only_step(
                st, scene, jax.random.PRNGKey(1000 + i), cfg)
        np.asarray(st.hash_table.sum())
        t(f"{train_steps} train steps done")
        if ckpt:
            from neuralradiancecaching_tpu.io import checkpoint
            checkpoint.save(ckpt, st)

    band_rows = int(os.environ.get("BAND", 54))

    def accum(c, spp_total, key0, banded, env_rgb=None, baked=None,
              pack=None):
        acc = None
        for i in range(spp_total):
            k = jax.random.PRNGKey(key0 + i)
            if banded:
                img = render_banded(st, scene, k, c, band_rows=band_rows,
                                    env_rgb=env_rgb, baked=baked, pack=pack)
            else:
                img = frame_mod.render_only_step(st, scene, k, c)
            acc = img if acc is None else acc + img
        return np.asarray(acc / spp_total)

    def size_cfg(w, h):
        return dataclasses.replace(
            cfg,
            camera=dataclasses.replace(cfg.camera, aspect=w / h),
            render=dataclasses.replace(cfg.render, width=w, height=h,
                                       use_nn=True,
                                       query_cap_fraction=0.375),
        )

    def shipped_cfg(w, h):
        """The headline pipeline's caps (bench.py formulas): live-ray
        pack + uncapped chunked query + bf16 query compute. Probe values
        from the bench probe cache when present (same scene and pose)."""
        qcfg = size_cfg(w, h)
        live_frac, ev_mean, k_slots = 0.19, 0.255, 5.0
        try:
            import json
            pth = os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache",
                "bench_probes.json")
            with open(pth) as f:
                probes = next(iter(json.load(f).values()))
            live_frac = probes["live_frac"]
            ev_mean, k_slots = probes["ev_mean"], probes["k_slots"]
        except (OSError, ValueError, StopIteration, KeyError):
            pass
        pack = min(1.0, float(np.ceil((live_frac * 1.05 + 0.005) / 0.015625)
                              * 0.015625))
        shade_cap = min(k_slots,
                        float(np.ceil((ev_mean * 1.05 + 0.01) / 0.015625)
                              * 0.015625))
        return dataclasses.replace(
            qcfg,
            render=dataclasses.replace(qcfg.render, query_cap_fraction=1.0,
                                       shade_cap_fraction=shade_cap,
                                       live_pack_fraction=pack),
            mlp=dataclasses.replace(qcfg.mlp, inference_dtype="bfloat16"))

    nn_sizes = os.environ.get("NN_SIZES", "512,1080").split(",")
    if "nn" in legs:
        # NN noise-sub leg at the shipped 512^2 and at the 1080p headline
        # size (banded + packed + hoisted, like the throughput loop)
        for (w, h, banded) in [(512, 512, False), (1920, 1080, True)]:
            if str(h) not in nn_sizes:
                continue
            if banded:
                from neuralradiancecaching_tpu.render.tiled import (
                    frame_env_color, frame_live_pack)
                qcfg = shipped_cfg(w, h)
                env_rgb = frame_env_color(scene, qcfg)
                baked = nrc.bake(st, qcfg)
                pack = frame_live_pack(scene, qcfg, band_rows)
                hoists = dict(env_rgb=env_rgb, baked=baked, pack=pack)
                t(f"shipped-pipeline hoists ready ({w}x{h}, pack="
                  f"{qcfg.render.live_pack_fraction}, shade_cap="
                  f"{qcfg.render.shade_cap_fraction})")
            else:
                qcfg = size_cfg(w, h)
                hoists = {}
            rcfg = dataclasses.replace(qcfg, render=dataclasses.replace(
                qcfg.render, use_nn=False))
            a1 = accum(qcfg, spp_nn, 2000, banded, **hoists)
            t(f"NN twin A done ({w}x{h})")
            a2 = accum(qcfg, spp_nn, 6000, banded, **hoists)
            # ref twins: no-NN banded (render_banded's _bands_program
            # path -- no query buffers, no pack needed)
            r1 = accum(rcfg, spp_ref, 3000, banded)
            t(f"ref twin A done ({w}x{h})")
            r2 = accum(rcfg, spp_ref, 7000, banded)
            bias, floor = noise_subtracted_bias(a1, a2, r1, r2)
            t(f"NN leg {w}x{h}: noise_sub={bias:.5f} floor={floor:.5f} "
              f"mean_delta={(a1 + a2).mean() / (r1 + r2).mean() - 1:+.5f}")

    if "gt" in legs:
        # GT leg (shipped no-NN collision render vs the unbiased oracle)
        # at the shipped 256^2 and at 512^2
        for side in (256, 512):
            gcfg = dataclasses.replace(
                size_cfg(side, side),
                render=dataclasses.replace(cfg.render, width=side,
                                           height=side, use_nn=False))
            ocfg = dataclasses.replace(
                gcfg,
                path=dataclasses.replace(gcfg.path, sampler="delta",
                                         transmittance_mode="ratio"),
                env_map=dataclasses.replace(gcfg.env_map,
                                            in_scatter_mode="mc",
                                            transmittance_mode="ratio"))
            g1 = accum(gcfg, gt_spp, 20000, False)
            g2 = accum(gcfg, gt_spp, 24000, False)
            o1 = accum(ocfg, 2 * gt_spp, 21000, False)
            o2 = accum(ocfg, 2 * gt_spp, 25000, False)
            bias, floor = noise_subtracted_bias(g1, g2, o1, o2)
            t(f"GT leg {side}^2: noise_sub={bias:.5f} floor={floor:.5f} "
              f"mean_delta={(g1 + g2).mean() / (o1 + o2).mean() - 1:+.5f}")


if __name__ == "__main__":
    main()
