"""The tiny fully-connected ReLU MLP (the radiance cache network).

Reference: 6 matmul layers 64->64 x5 ->3, ReLU after EVERY layer including
the output (nrc-forward.frag:503-534, ApplyWeights0-5 + ActivateNr1-6);
weight init N(0,1)*0.01 (NeuralRadianceCache.cpp:629-645); biases zero
(fixing quirk #1, the reference leaves them uninitialized,
NeuralRadianceCache.cpp:699).

TPU-native design: the reference evaluates one 64-wide matvec per GPU thread
in registers; here the batch dimension is the MXU's M dimension -- a (B, 64)
activation block against (64, 64) weights is exactly MXU-shaped. Weights are
stored (in_features, out_features) so the forward is ``x @ w + b`` with no
transposes. A fused Pallas kernel that keeps all six weight matrices resident
in VMEM lives in :mod:`neuralradiancecaching_tpu.ops.pallas_mlp`; this module
is the pure-jnp reference implementation and the autodiff path for training.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

from neuralradiancecaching_tpu.config import MLPConfig

Params = Dict[str, jnp.ndarray]


def layer_dims(cfg: MLPConfig) -> List[int]:
    """[in, hidden, ..., hidden, out] -- n_layers matmuls total."""
    return [cfg.in_features] + [cfg.hidden] * (cfg.n_layers - 1) + [cfg.out_features]


def init_params(key: jax.Array, cfg: MLPConfig,
                dtype=jnp.float32) -> Params:
    """Weights N(0, weight_init_std^2), biases zero."""
    dims = layer_dims(cfg)
    params: Params = {}
    keys = jax.random.split(key, cfg.n_layers)
    for i in range(cfg.n_layers):
        params[f"w{i}"] = (
            jax.random.normal(keys[i], (dims[i], dims[i + 1]), dtype=dtype)
            * cfg.weight_init_std
        )
        params[f"b{i}"] = jnp.zeros((dims[i + 1],), dtype=dtype)
    return params


def _activate(h: jnp.ndarray, cfg: MLPConfig) -> jnp.ndarray:
    if cfg.activation == "sigmoid":
        return jax.nn.sigmoid(h)
    return jnp.maximum(h, 0.0)


def apply(params: Params, x: jnp.ndarray, cfg: MLPConfig) -> jnp.ndarray:
    """Forward pass. x: (..., in_features) -> (..., out_features).

    Activation after every layer; the output activation is the reference's
    radiance clamp (quirk #5 -- kept, it defines the model's function
    class).
    """
    h = x
    for i in range(cfg.n_layers):
        h = jnp.dot(h, params[f"w{i}"], preferred_element_type=jnp.float32)
        h = h + params[f"b{i}"]
        if i < cfg.n_layers - 1 or cfg.output_relu:
            h = _activate(h, cfg)
    return h


def nrc_loss(params: Params, x: jnp.ndarray, target: jnp.ndarray,
             cfg: MLPConfig, valid: jnp.ndarray | None = None,
             kind: str = "mse"):
    """The training loss + stat.

    kind='mse' (reference): per-sample loss whose gradient matches
    nr6 = 2*(pred - target) per channel (nrc-train.comp:1010-1012) with
    1/B batch normalization (ONE_OVER_PIXEL_COUNT, :207-210):
    L = mean_B sum_C (pred-target)^2. The logged MSE stat is
    mean_B mean_C err^2 (:1007-1008).

    kind='relative_l2': (pred-target)^2 / (stop_grad(pred)^2 + eps) -- the
    standard HDR radiance-regression loss (used by published neural
    radiance caches): plain MSE lets bright regions dominate the gradient
    and underfits dim regions by their radiance ratio.

    ``valid`` masks out samples whose encoding went NaN (the reference's
    early-out, nrc-train.comp:993-999).
    """
    pred = apply(params, x, cfg)
    err = pred - target
    if valid is not None:
        err = jnp.where(valid[..., None], err, 0.0)
    if kind == "relative_l2":
        denom = jax.lax.stop_gradient(pred) ** 2 + 1e-2
        loss = jnp.mean(jnp.sum(err * err / denom, axis=-1))
    else:
        loss = jnp.mean(jnp.sum(err * err, axis=-1))
    mse_stat = jnp.mean(err * err)
    return loss, mse_stat
