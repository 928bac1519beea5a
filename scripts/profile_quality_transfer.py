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

Env: TRAIN (default 400), SPP_NN (8), SPP_REF (32), GT_SPP (16),
LEGS=nn,gt subset.
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
    for i in range(train_steps):
        st, _ = frame_mod.train_only_step(st, scene,
                                          jax.random.PRNGKey(1000 + i), cfg)
    np.asarray(st.hash_table.sum())
    t(f"{train_steps} train steps done")

    def accum(c, spp_total, key0, banded):
        acc = None
        for i in range(spp_total):
            k = jax.random.PRNGKey(key0 + i)
            if banded:
                img = render_banded(st, scene, k, c, band_rows=54)
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

    if "nn" in legs:
        # NN noise-sub leg at the shipped 512^2 and at the 1080p headline
        # size (banded, like the throughput loop renders it)
        for (w, h, banded) in [(512, 512, False), (1920, 1080, True)]:
            qcfg = size_cfg(w, h)
            rcfg = dataclasses.replace(qcfg, render=dataclasses.replace(
                qcfg.render, use_nn=False))
            a1 = accum(qcfg, spp_nn, 2000, banded)
            a2 = accum(qcfg, spp_nn, 6000, banded)
            r1 = accum(rcfg, spp_ref, 3000, banded)
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
