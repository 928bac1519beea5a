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


def init_adam(params: PyTree) -> Tuple[PyTree, PyTree]:
    """Zero (m, v) Adam state, one pair of leaves per parameter."""
    z = jax.tree_util.tree_map(jnp.zeros_like, params)
    return z, jax.tree_util.tree_map(jnp.zeros_like, params)


def adam_step(
    params: PyTree,
    m: PyTree,
    v: PyTree,
    grads: PyTree,
    step: jnp.ndarray,
    cfg: OptimizerConfig,
    skip_zero_grad: bool = False,
    lr_scale: jnp.ndarray | None = None,
) -> Tuple[PyTree, PyTree, PyTree]:
    """One guarded Adam step (kind='adam').

    Extends the reference's optimizer family (nrc-step.comp is
    momentum-SGD-only) with the Instant-NGP standard for hash-grid
    training: beta1=0.9, beta2=0.99, eps=1e-15, and -- when
    ``skip_zero_grad`` -- moments and parameters update ONLY where the
    batch gradient is nonzero (sparse hash rows: decaying the moments of
    untouched rows both wastes work and un-learns them).

    Keeps the reference's guard semantics: non-finite gradients are
    zeroed and clipped to ``clip_border`` (guard_delta), and non-finite
    or exploded parameters reset to 0 (reset_bad_params).

    ``step`` is the 1-based step counter AFTER this update (callers pass
    the incremented counter) used for bias correction.

    ``lr_scale``: optional traced scalar multiplying the learning rate
    (the lr-decay schedule, OptimizerConfig.lr_decay_steps -- computed by
    the caller from the same ``step`` counter; None = 1).
    """
    b1, b2 = cfg.beta1, cfg.beta2
    bc1 = 1.0 - b1 ** step.astype(jnp.float32)
    bc2 = 1.0 - b2 ** step.astype(jnp.float32)
    lr = (cfg.learning_rate if lr_scale is None
          else cfg.learning_rate * lr_scale)

    def leaf(w, m_i, v_i, g):
        g = -guards.guard_delta(-g, cfg.clip_border)  # NaN->0, clip
        # sparse-row test on the RAW batch gradient: weight decay applies
        # only to rows the batch touched, else decay would mark every row
        # 'touched' and silently disable the sparse semantics
        touched = g != 0.0
        g = g + cfg.weight_decay * w
        m_new = b1 * m_i + (1.0 - b1) * g
        v_new = b2 * v_i + (1.0 - b2) * g * g
        upd = (m_new / bc1) / (jnp.sqrt(v_new / bc2) + cfg.eps)
        w_new = w - lr * upd
        if skip_zero_grad:
            m_new = jnp.where(touched, m_new, m_i)
            v_new = jnp.where(touched, v_new, v_i)
            w_new = jnp.where(touched, w_new, w)
        w_new = guards.reset_bad_params(w_new, cfg.reset_border)
        return w_new, m_new, v_new

    flat = jax.tree_util.tree_map(leaf, params, m, v, grads)
    is_t = lambda t: isinstance(t, tuple)  # noqa: E731
    pick = lambda i: jax.tree_util.tree_map(lambda t: t[i], flat,  # noqa
                                            is_leaf=is_t)
    return pick(0), pick(1), pick(2)


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
