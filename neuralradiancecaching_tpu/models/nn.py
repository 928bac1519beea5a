"""Generic sequential NN API -- the reference's vestigial compute library
(include/engine/compute/: Matrix, Matmul, Layer, LinearLayer, SigmoidLayer,
NeuralNetwork -- headers declared, never implemented; SURVEY.md §1 L6)
implemented for real, TPU-style: layers are declarative specs, parameters
live in one pytree, forward is a jitted fold, training reuses the guarded
momentum-SGD of ops/optimizers.

The matmul backend is the MXU (ops/pallas_matmul for an explicit kernel,
plain jnp.dot otherwise) instead of matmul.comp's per-element threads.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp

from neuralradiancecaching_tpu.config import OptimizerConfig
from neuralradiancecaching_tpu.ops import optimizers


@dataclass(frozen=True)
class Linear:
    """LinearLayer.hpp equivalent: y = x @ W + b."""

    in_features: int
    out_features: int
    init_std: float = 0.1


@dataclass(frozen=True)
class Sigmoid:
    """SigmoidLayer.hpp equivalent."""


@dataclass(frozen=True)
class Relu:
    pass


Layer = object  # Linear | Sigmoid | Relu


class Sequential:
    """NeuralNetwork.hpp equivalent: an ordered stack of layers.

    >>> net = Sequential([Linear(4, 8), Sigmoid(), Linear(8, 2)])
    >>> params = net.init(jax.random.PRNGKey(0))
    >>> y = net.apply(params, x)
    """

    def __init__(self, layers: List[Layer]):
        self.layers = tuple(layers)

    def init(self, key: jax.Array, dtype=jnp.float32) -> dict:
        params = {}
        i = 0
        for layer in self.layers:
            if isinstance(layer, Linear):
                key, sub = jax.random.split(key)
                params[f"w{i}"] = (jax.random.normal(
                    sub, (layer.in_features, layer.out_features), dtype)
                    * layer.init_std)
                params[f"b{i}"] = jnp.zeros((layer.out_features,), dtype)
                i += 1
        return params

    def apply(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        h = x
        i = 0
        for layer in self.layers:
            if isinstance(layer, Linear):
                h = jnp.dot(h, params[f"w{i}"],
                            preferred_element_type=jnp.float32)
                h = h + params[f"b{i}"]
                i += 1
            elif isinstance(layer, Sigmoid):
                h = jax.nn.sigmoid(h)
            elif isinstance(layer, Relu):
                h = jnp.maximum(h, 0.0)
            else:
                raise TypeError(f"unknown layer {layer!r}")
        return h

    def train_step(self, params: dict, momentum: dict, x, target,
                   opt: OptimizerConfig) -> Tuple[dict, dict, jnp.ndarray]:
        """One guarded momentum-SGD step on MSE loss (the NeuralNetwork
        'Backprop' the reference never implemented)."""

        def loss_fn(p):
            pred = self.apply(p, x)
            return jnp.mean((pred - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, momentum = optimizers.momentum_sgd_step(params, momentum,
                                                        grads, opt)
        return params, momentum, loss
