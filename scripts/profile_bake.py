"""Time each scene-field bake separately on the TPU (1080p preset shapes)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from neuralradiancecaching_tpu.utils import setup_cache

setup_cache()

from neuralradiancecaching_tpu import config as cfg_mod
from neuralradiancecaching_tpu.io import assets
from neuralradiancecaching_tpu.ops import collision, lightfield
from neuralradiancecaching_tpu.ops import volume as volume_ops


def timeit(name, fn):
    t0 = time.perf_counter()
    out = fn()
    np.asarray(out.sum())
    t1 = time.perf_counter()
    # second call = warm (compile cached, field re-baked)
    out = fn()
    np.asarray(out.sum())
    t2 = time.perf_counter()
    print(f"{name:32s} cold {t1-t0:7.1f} s   warm {t2-t1:7.1f} s",
          flush=True)
    return out


def main():
    cfg = cfg_mod.progressive_1080p_config()
    density = assets.load_cloud()
    corner = volume_ops.build_corner_table(
        volume_ops.quantize_8bit(density)
        if cfg.quirks.quantize_density_8bit else density)
    np.asarray(corner.sum())

    timeit("transmittance_field", lambda: lightfield.build_transmittance_field(
        corner, cfg.volume, steps=cfg.env_map.transmittance_steps))
    env_img = assets.load_env_map()
    timeit("scatter_field", lambda: lightfield.build_scatter_field(
        corner, env_img, cfg.volume, hg_g=cfg.volume.hg_g,
        steps=cfg.env_map.transmittance_steps))
    timeit("collision_field", lambda: collision.build_collision_field(
        corner, cfg.volume, steps=cfg.path.collision_field_steps))


if __name__ == "__main__":
    main()
