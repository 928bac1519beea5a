"""BASELINE config 2: 2D image fit -- MRHE(2D) + tiny MLP regression.

Proves the hash-encoding gradient path (the scatter-add that replaces the
reference's atomicAdd into mrDeltaHashTable) on a workload where quality is
trivially measurable: regress RGB(u, v) of a target image. SURVEY.md §7
stage 3.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from neuralradiancecaching_tpu.config import (MLPConfig, MRHEConfig,
                                              OptimizerConfig, QuirkFlags)
from neuralradiancecaching_tpu.ops import mlp as mlp_ops
from neuralradiancecaching_tpu.ops import mrhe as mrhe_ops
from neuralradiancecaching_tpu.ops import optimizers


class ImageFitState(NamedTuple):
    mlp_params: dict
    mlp_momentum: dict
    hash_table: jnp.ndarray


def default_configs() -> Tuple[MRHEConfig, MLPConfig, OptimizerConfig]:
    mrhe_cfg = MRHEConfig(n_dims=2)
    mlp_cfg = MLPConfig(in_features=mrhe_cfg.n_outputs, hidden=64,
                        out_features=3, n_layers=4, output_relu=True)
    opt = OptimizerConfig(learning_rate=0.01, beta1=0.5)
    return mrhe_cfg, mlp_cfg, opt


def init_state(key: jax.Array, mrhe_cfg: MRHEConfig,
               mlp_cfg: MLPConfig) -> ImageFitState:
    k1, k2 = jax.random.split(key)
    params = mlp_ops.init_params(k1, mlp_cfg)
    return ImageFitState(params, optimizers.init_momentum(params),
                         mrhe_ops.init_table(k2, mrhe_cfg))


def predict(state: ImageFitState, uv: jnp.ndarray, mrhe_cfg: MRHEConfig,
            mlp_cfg: MLPConfig,
            quirks: QuirkFlags = QuirkFlags()) -> jnp.ndarray:
    """uv (N, 2) in [0,1]^2 -> rgb (N, 3)."""
    feats = mrhe_ops.encode(state.hash_table, uv, mrhe_cfg, quirks)
    return mlp_ops.apply(state.mlp_params, feats, mlp_cfg)


@partial(jax.jit, static_argnames=("mrhe_cfg", "mlp_cfg", "opt", "quirks"))
def train_step(state: ImageFitState, uv: jnp.ndarray, rgb: jnp.ndarray,
               mrhe_cfg: MRHEConfig, mlp_cfg: MLPConfig,
               opt: OptimizerConfig, quirks: QuirkFlags = QuirkFlags()
               ) -> Tuple[ImageFitState, jnp.ndarray]:
    def loss(params, table):
        feats = mrhe_ops.encode(table, uv, mrhe_cfg, quirks)
        return mlp_ops.nrc_loss(params, feats, rgb, mlp_cfg)

    (_, mse), grads = jax.value_and_grad(loss, argnums=(0, 1),
                                         has_aux=True)(
        state.mlp_params, state.hash_table)
    params, momentum = optimizers.momentum_sgd_step(
        state.mlp_params, state.mlp_momentum, grads[0], opt)
    table = optimizers.hash_sgd_step(state.hash_table, grads[1], mrhe_cfg)
    return ImageFitState(params, momentum, table), mse


def fit_image(image: jnp.ndarray, steps: int = 500, batch_size: int = 8192,
              seed: int = 0, mrhe_cfg=None, mlp_cfg=None, opt=None):
    """Fit RGB(u,v) of (H, W, 3) `image`. Returns (state, psnr_db)."""
    d_mrhe, d_mlp, d_opt = default_configs()
    mrhe_cfg = mrhe_cfg or d_mrhe
    mlp_cfg = mlp_cfg or d_mlp
    opt = opt or d_opt

    image = jnp.asarray(image, dtype=jnp.float32)
    h, w = image.shape[:2]
    key = jax.random.PRNGKey(seed)
    state = init_state(key, mrhe_cfg, mlp_cfg)

    flat = image.reshape(-1, 3)
    for i in range(steps):
        k = jax.random.fold_in(key, i)
        idx = jax.random.randint(k, (batch_size,), 0, h * w)
        vy = (idx // w).astype(jnp.float32) / h
        vx = (idx % w).astype(jnp.float32) / w
        uv = jnp.stack([vx, vy], axis=-1)
        state, _ = train_step(state, uv, flat[idx], mrhe_cfg, mlp_cfg, opt)

    # full-image PSNR
    ys, xs = jnp.meshgrid(jnp.arange(h) / h, jnp.arange(w) / w,
                          indexing="ij")
    uv = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)
    pred = predict(state, uv, mrhe_cfg, mlp_cfg)
    mse = jnp.mean((pred - flat) ** 2)
    peak = jnp.maximum(jnp.max(flat), 1.0)
    psnr = 10.0 * jnp.log10(peak * peak / jnp.maximum(mse, 1e-12))
    return state, float(psnr)
