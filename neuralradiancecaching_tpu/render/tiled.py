"""Tiled rendering: split the pixel grid into row bands so arbitrarily large
frames fit in HBM (the per-step transient buffers are O(rays * env_samples *
transmittance_steps)). One compile serves every band (same shapes)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from neuralradiancecaching_tpu.config import NRCConfig
from neuralradiancecaching_tpu.models import nrc
from neuralradiancecaching_tpu.render import pathtrace
from neuralradiancecaching_tpu.scene.camera import pixel_rays
from neuralradiancecaching_tpu.scene.scene import Scene


@partial(jax.jit, static_argnames=("cfg",))
def _render_band(state: nrc.NRCState, baked: jnp.ndarray, scene: Scene,
                 key: jax.Array, ro: jnp.ndarray, rd: jnp.ndarray,
                 cfg: NRCConfig):
    def query_fn(qpos, qdir):
        return nrc.query_baked(state, baked, qpos, qdir, cfg)

    rgb, _ = pathtrace.render_image(scene, cfg, ro, rd, key,
                                    query_fn=query_fn)
    return rgb


def render_tiled(state: nrc.NRCState, scene: Scene, key: jax.Array,
                 cfg: NRCConfig, band_rows: int = 128) -> np.ndarray:
    """Render (H, W, 3) in bands of `band_rows` rows. Returns numpy."""
    h, w = cfg.render.height, cfg.render.width
    ro, rd = pixel_rays(scene.camera, w, h)
    ro = ro.reshape(h, w, 3)
    rd = rd.reshape(h, w, 3)
    assert h % band_rows == 0, (h, band_rows)
    baked = nrc.bake(state, cfg)  # once per frame, shared by all bands
    out = np.zeros((h, w, 3), dtype=np.float32)
    for y0 in range(0, h, band_rows):
        kb = jax.random.fold_in(key, y0)
        band = _render_band(state, baked, scene, kb,
                            ro[y0:y0 + band_rows].reshape(-1, 3),
                            rd[y0:y0 + band_rows].reshape(-1, 3), cfg)
        out[y0:y0 + band_rows] = np.asarray(band).reshape(band_rows, w, 3)
    return out
