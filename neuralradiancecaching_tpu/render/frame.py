"""The per-frame step: train -> optimizer steps -> render, as ONE jitted
XLA program.

This is the reference's pre-recorded Vulkan command buffer
(NrcHpmRenderer::RecordCommandBuffer, NrcHpmRenderer.cpp:571-731: train
dispatch -> barrier -> nrc-step -> barrier -> mrhe-step -> barrier -> render
pass) re-expressed as a single jit: the barriers are data dependencies, the
queue-submit round trips vanish, and train-batch formation happens on-device.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from neuralradiancecaching_tpu.config import NRCConfig
from neuralradiancecaching_tpu.models import nrc
from neuralradiancecaching_tpu.render import pathtrace, targets
from neuralradiancecaching_tpu.scene.camera import pixel_rays
from neuralradiancecaching_tpu.scene.scene import Scene


class FrameOutput(NamedTuple):
    image: jnp.ndarray  # (H, W, 3)
    mse: jnp.ndarray    # scalar train-loss stat (nrcStats.mseLoss)


@partial(jax.jit, static_argnames=("cfg", "train"))
def frame_step(state: nrc.NRCState, scene: Scene, key: jax.Array,
               cfg: NRCConfig, train: bool = True
               ) -> Tuple[nrc.NRCState, FrameOutput]:
    """One frame: (optionally) one online training pass, then the render.

    Mirrors the reference frame loop (src/main.cpp:181-246) minus
    presentation; the returned image is row-major (H, W, 3) linear radiance.
    """
    k_train, k_render = jax.random.split(key)

    mse = jnp.float32(0.0)
    if train:
        batch = targets.generate_train_batch(scene, cfg, k_train)
        state, mse = nrc.train_step(state, batch.pos, batch.dir,
                                    batch.target, cfg)

    ro, rd = pixel_rays(scene.camera, cfg.render.width, cfg.render.height)
    baked = nrc.bake(state, cfg)

    query_fn = nrc.make_baked_query_fn(state, baked, cfg)

    rgb, _ = pathtrace.render_image(scene, cfg, ro, rd, k_render,
                                    query_fn=query_fn)
    image = rgb.reshape(cfg.render.height, cfg.render.width, 3)
    return state, FrameOutput(image=image, mse=mse)


@partial(jax.jit, static_argnames=("cfg",))
def train_only_step(state: nrc.NRCState, scene: Scene, key: jax.Array,
                    cfg: NRCConfig) -> Tuple[nrc.NRCState, jnp.ndarray]:
    """Training pass without a render (warm-up loops, benchmarks)."""
    batch = targets.generate_train_batch(scene, cfg, key)
    return nrc.train_step(state, batch.pos, batch.dir, batch.target, cfg)


@partial(jax.jit, static_argnames=("cfg",))
def render_only_step(state: nrc.NRCState, scene: Scene, key: jax.Array,
                     cfg: NRCConfig) -> jnp.ndarray:
    """Render pass alone (converged-cache benchmarking)."""
    ro, rd = pixel_rays(scene.camera, cfg.render.width, cfg.render.height)
    baked = nrc.bake(state, cfg)

    query_fn = nrc.make_baked_query_fn(state, baked, cfg)

    rgb, _ = pathtrace.render_image(scene, cfg, ro, rd, key,
                                    query_fn=query_fn)
    return rgb.reshape(cfg.render.height, cfg.render.width, 3)
