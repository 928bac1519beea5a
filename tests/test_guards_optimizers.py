"""Unit tests for the NaN/clip guards and the guarded optimizers
(nrc-step.comp / mrhe-step.comp semantics)."""

import jax.numpy as jnp
import numpy as np

from neuralradiancecaching_tpu.config import MRHEConfig, OptimizerConfig
from neuralradiancecaching_tpu.ops import guards, optimizers


def test_guard_delta_passthrough_and_clip():
    x = jnp.array([0.5, -3.0, 999.0, 1001.0, -5000.0, jnp.inf, -jnp.inf,
                   jnp.nan])
    out = guards.guard_delta(x, border=1000.0)
    np.testing.assert_allclose(
        np.asarray(out),
        [0.5, -3.0, 999.0, 1000.0, -1000.0, 1000.0, -1000.0, 0.0])


def test_guard_delta_mrhe_border():
    # mrhe-step.comp:34 clips to border 100 but only values beyond 1000
    # count as bad -- 500 passes through untouched
    x = jnp.array([500.0, 2000.0])
    out = guards.guard_delta(x, border=100.0)
    np.testing.assert_allclose(np.asarray(out), [500.0, 100.0])


def test_reset_bad_params():
    w = jnp.array([1.0, -999.0, 1500.0, jnp.nan, jnp.inf])
    out = guards.reset_bad_params(w)
    np.testing.assert_allclose(np.asarray(out), [1.0, -999.0, 0.0, 0.0, 0.0])


def test_momentum_sgd_matches_reference_recurrence():
    # hand-computed single step: m=0, g=0.1, lr=0.001, b1=0.5, wd=0
    # delta=-g=-0.1; m' = 0.5*(-0.1) + 0 = -0.05; w' = w + 0.001*(-0.05)
    cfg = OptimizerConfig()
    params = {"w": jnp.array([2.0])}
    mom = optimizers.init_momentum(params)
    grads = {"w": jnp.array([0.1])}
    p2, m2 = optimizers.momentum_sgd_step(params, mom, grads, cfg)
    np.testing.assert_allclose(np.asarray(m2["w"]), [-0.05])
    np.testing.assert_allclose(np.asarray(p2["w"]), [2.0 - 0.00005])

    # second step with same grad: m'' = 0.5*(-0.1) + 0.5*(-0.05) = -0.075
    p3, m3 = optimizers.momentum_sgd_step(p2, m2, grads, cfg)
    np.testing.assert_allclose(np.asarray(m3["w"]), [-0.075], rtol=1e-6)


def test_momentum_sgd_weight_decay_sign():
    # delta += -w*wd before momentum (nrc-step.comp:215)
    cfg = OptimizerConfig(weight_decay=0.1, beta1=0.0, learning_rate=1.0)
    params = {"w": jnp.array([10.0])}
    mom = optimizers.init_momentum(params)
    grads = {"w": jnp.array([0.0])}
    p2, _ = optimizers.momentum_sgd_step(params, mom, grads, cfg)
    # delta = 0 - 10*0.1 = -1; w' = 10 + 1.0*(-1) = 9
    np.testing.assert_allclose(np.asarray(p2["w"]), [9.0])


def test_momentum_sgd_nan_grad_contained():
    cfg = OptimizerConfig()
    params = {"w": jnp.array([1.0, 2.0])}
    mom = optimizers.init_momentum(params)
    grads = {"w": jnp.array([jnp.nan, jnp.inf])}
    p2, m2 = optimizers.momentum_sgd_step(params, mom, grads, cfg)
    assert bool(jnp.all(jnp.isfinite(p2["w"])))
    assert bool(jnp.all(jnp.isfinite(m2["w"])))


def test_hash_sgd_step():
    cfg = MRHEConfig(learning_rate=0.01, weight_decay=0.0)
    table = jnp.ones((2, 4, 2))
    grad = jnp.full((2, 4, 2), 0.5)
    out = optimizers.hash_sgd_step(table, grad, cfg)
    np.testing.assert_allclose(np.asarray(out), 1.0 - 0.01 * 0.5)


def test_hash_sgd_explosion_reset():
    cfg = MRHEConfig(learning_rate=1.0)
    table = jnp.array([999.5])
    grad = jnp.array([-600.0])  # w' = 999.5 + 600 = 1599.5 > 1000 -> reset
    out = optimizers.hash_sgd_step(table, grad, cfg)
    np.testing.assert_allclose(np.asarray(out), [0.0])
