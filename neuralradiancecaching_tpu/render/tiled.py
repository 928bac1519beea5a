"""Tiled rendering: split the pixel grid into row bands so arbitrarily large
frames fit in HBM (the per-band transient buffers are O(band_rays *
env_samples), not O(frame)).

Two strategies, same math:

* :func:`render_banded` -- the band loop INSIDE one jitted program
  (``lax.map`` over row bands). This is the reference's single pre-recorded
  command buffer (NrcHpmRenderer.cpp:571-731) at production sizes: one
  dispatch per frame, image stays on device. Transients are bounded exactly
  like the host loop because lax.map runs bands sequentially.
* :func:`render_tiled` -- host-side band loop (one jitted band program
  re-dispatched per band). Kept for environments where a whole-frame
  program cannot be compiled (the remote compile helper used by the axon
  tunnel crashes on very large programs); also what the multi-host DP path
  builds on. Returns a DEVICE array -- the old per-band np.asarray forced a
  device->host transfer per band (~24 MB per 1080p frame at the ~20 MB/s
  tunnel rate = over 1 s/frame); callers that want numpy do one transfer at
  the end.
"""

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
                 cfg: NRCConfig, band_rows: int = 128) -> jnp.ndarray:
    """Render (H, W, 3) with a host-side loop over `band_rows`-row bands.

    Returns a DEVICE array; np.asarray() it once if host bytes are needed.
    """
    h, w = cfg.render.height, cfg.render.width
    ro, rd = pixel_rays(scene.camera, w, h)
    ro = ro.reshape(h, w, 3)
    rd = rd.reshape(h, w, 3)
    assert h % band_rows == 0, (h, band_rows)
    baked = nrc.bake(state, cfg)  # once per frame, shared by all bands
    bands = []
    for y0 in range(0, h, band_rows):
        kb = jax.random.fold_in(key, y0)
        band = _render_band(state, baked, scene, kb,
                            ro[y0:y0 + band_rows].reshape(-1, 3),
                            rd[y0:y0 + band_rows].reshape(-1, 3), cfg)
        bands.append(band.reshape(band_rows, w, 3))
    return jnp.concatenate(bands, axis=0)


@partial(jax.jit, static_argnames=("cfg", "band_rows"))
def render_banded(state: nrc.NRCState, scene: Scene, key: jax.Array,
                  cfg: NRCConfig, band_rows: int = 108) -> jnp.ndarray:
    """Whole frame as ONE jitted program: ``lax.map`` over row bands.

    Numerically identical to :func:`render_tiled` with the same band size
    and per-band fold_in keys (tested); transients stay band-sized because
    lax.map is sequential.
    """
    h, w = cfg.render.height, cfg.render.width
    assert h % band_rows == 0, (h, band_rows)
    n_bands = h // band_rows
    ro, rd = pixel_rays(scene.camera, w, h)
    ro_b = ro.reshape(n_bands, band_rows * w, 3)
    rd_b = rd.reshape(n_bands, band_rows * w, 3)
    y0s = jnp.arange(n_bands, dtype=jnp.int32) * band_rows
    baked = nrc.bake(state, cfg)

    def query_fn(qpos, qdir):
        return nrc.query_baked(state, baked, qpos, qdir, cfg)

    def band(args):
        y0, ro_i, rd_i = args
        kb = jax.random.fold_in(key, y0)
        rgb, _ = pathtrace.render_image(scene, cfg, ro_i, rd_i, kb,
                                        query_fn=query_fn)
        return rgb

    out = jax.lax.map(band, (y0s, ro_b, rd_b))  # (n_bands, band*w, 3)
    return out.reshape(h, w, 3)
