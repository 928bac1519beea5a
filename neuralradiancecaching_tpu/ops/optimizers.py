"""Guarded optimizers: the nrc-step / mrhe-step kernels as pytree updates.

The reference accumulates the NEGATIVE batch-mean gradient into "delta"
buffers (atomicAdd of ``-grad * 1/pixelCount``, nrc-train.comp:758) and then
steps ``w += lr * m`` with ``m = (1-b1)*(guard(delta) - wd*w) + b1*m``
(nrc-step.comp:220-236). Here the caller passes the STANDARD batch-mean
gradient ``g`` (as produced by ``jax.grad``); the sign flip happens inside,
so the math is identical: ``m = (1-b1)*(guard(-g) - wd*w) + b1*m``.

Both optimizers are plain pytree maps -- a single fused XLA elementwise pass
per parameter leaf, no Pallas needed (the reference needs 4096+524288-thread
dispatches only because of Vulkan's execution model).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

from neuralradiancecaching_tpu.config import MRHEConfig, OptimizerConfig
from neuralradiancecaching_tpu.ops import guards

PyTree = Any


def init_momentum(params: PyTree) -> PyTree:
    """Zero momentum state, one leaf per parameter (the Momentum1* SSBOs)."""
    return jax.tree_util.tree_map(jnp.zeros_like, params)


def momentum_sgd_step(
    params: PyTree,
    momentum: PyTree,
    grads: PyTree,
    cfg: OptimizerConfig,
) -> Tuple[PyTree, PyTree]:
    """One guarded momentum-SGD step (nrc-step.comp semantics).

    Args:
      params / momentum / grads: matching pytrees; ``grads`` is the standard
        batch-mean gradient dL/dw.
    Returns:
      (new_params, new_momentum).
    """

    def leaf(w, m, g):
        delta = guards.guard_delta(-g, cfg.clip_border)
        delta = delta - w * cfg.weight_decay
        m_new = (1.0 - cfg.beta1) * delta + cfg.beta1 * m
        w_new = w + cfg.learning_rate * m_new
        w_new = guards.reset_bad_params(w_new, cfg.reset_border)
        return w_new, m_new

    flat = jax.tree_util.tree_map(leaf, params, momentum, grads)
    new_params = jax.tree_util.tree_map(lambda t: t[0], flat,
                                        is_leaf=lambda t: isinstance(t, tuple))
    new_momentum = jax.tree_util.tree_map(lambda t: t[1], flat,
                                          is_leaf=lambda t: isinstance(t, tuple))
    return new_params, new_momentum


def hash_sgd_step(
    table: jnp.ndarray,
    grad: jnp.ndarray,
    cfg: MRHEConfig,
) -> jnp.ndarray:
    """One guarded plain-SGD step on the hash tables (mrhe-step.comp:47-56).

    ``grad`` is the standard batch-mean gradient dL/dtable.
    """
    delta = guards.guard_delta(-grad, cfg.clip_border)
    delta = delta - table * cfg.weight_decay
    table = table + cfg.learning_rate * delta
    return guards.reset_bad_params(table, cfg.reset_border)
