"""BASELINE config 1: MNIST tiny-MLP supervised fit.

The reference carries a vestigial compute-shader NN library + vendored MNIST
reader that were never wired up (SURVEY.md §1 L6); per the build plan this
workload is implemented for real: the same 64-wide MLP machinery and guarded
momentum-SGD optimizer as the radiance cache, trained as a 10-class
classifier. CPU-runnable sanity loop that establishes optimizer parity
(SURVEY.md §7 stage 2).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from neuralradiancecaching_tpu.config import MLPConfig, OptimizerConfig
from neuralradiancecaching_tpu.ops import mlp as mlp_ops
from neuralradiancecaching_tpu.ops import optimizers


class MnistState(NamedTuple):
    params: dict
    momentum: dict


def init_state(key: jax.Array, cfg: MLPConfig) -> MnistState:
    params = mlp_ops.init_params(key, cfg)
    return MnistState(params, optimizers.init_momentum(params))


def loss_fn(params, x, labels, cfg: MLPConfig):
    """Softmax cross-entropy; returns (loss, accuracy)."""
    logits = mlp_ops.apply(params, x, cfg)
    logp = jax.nn.log_softmax(logits)
    loss = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))
    acc = jnp.mean((jnp.argmax(logits, axis=1) == labels).astype(jnp.float32))
    return loss, acc


@partial(jax.jit, static_argnames=("cfg", "opt"))
def train_step(state: MnistState, x: jnp.ndarray, labels: jnp.ndarray,
               cfg: MLPConfig, opt: OptimizerConfig
               ) -> Tuple[MnistState, jnp.ndarray, jnp.ndarray]:
    (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, x, labels, cfg)
    params, momentum = optimizers.momentum_sgd_step(state.params,
                                                    state.momentum, grads,
                                                    opt)
    return MnistState(params, momentum), loss, acc


def train(x, labels, cfg: MLPConfig, opt: OptimizerConfig, steps: int = 200,
          batch_size: int = 256, seed: int = 0):
    """Minibatch training loop. Returns (state, final_loss, final_acc)."""
    key = jax.random.PRNGKey(seed)
    state = init_state(key, cfg)
    n = x.shape[0]
    x = jnp.asarray(x)
    labels = jnp.asarray(labels)
    loss = acc = None
    for i in range(steps):
        k = jax.random.fold_in(key, i)
        idx = jax.random.randint(k, (batch_size,), 0, n)
        state, loss, acc = train_step(state, x[idx], labels[idx], cfg, opt)
    return state, float(loss), float(acc)
