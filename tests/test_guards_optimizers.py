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


def test_adam_matches_dense_reference():
    """adam_step (without zero-skip) matches a hand-rolled Adam recurrence
    with bias correction."""
    cfg = OptimizerConfig(kind="adam", learning_rate=0.01, beta1=0.9,
                          beta2=0.99, eps=1e-15)
    w = jnp.array([1.0, -2.0])
    g = jnp.array([0.5, -0.25])
    m = jnp.zeros(2)
    v = jnp.zeros(2)
    params = {"w": w}
    mt, vt = {"w": m}, {"w": v}
    w_ref, m_ref, v_ref = np.asarray(w), np.asarray(m), np.asarray(v)
    for t in range(1, 4):
        params, mt, vt = optimizers.adam_step(
            params, mt, vt, {"w": g}, jnp.int32(t), cfg)
        m_ref = 0.9 * m_ref + 0.1 * np.asarray(g)
        v_ref = 0.99 * v_ref + 0.01 * np.asarray(g) ** 2
        mhat = m_ref / (1 - 0.9 ** t)
        vhat = v_ref / (1 - 0.99 ** t)
        w_ref = w_ref - 0.01 * mhat / (np.sqrt(vhat) + 1e-15)
    np.testing.assert_allclose(np.asarray(params["w"]), w_ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(mt["w"]), m_ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(vt["w"]), v_ref, rtol=1e-5)


def test_adam_skip_zero_grad_freezes_untouched_rows():
    """Sparse-hash semantics: rows with exactly-zero gradient keep their
    parameters AND moments (the Instant-NGP hash-grid recipe)."""
    cfg = OptimizerConfig(kind="adam", learning_rate=0.1, beta1=0.9,
                          beta2=0.99, eps=1e-15)
    w = jnp.array([1.0, 2.0])
    m = jnp.array([0.3, 0.4])
    v = jnp.array([0.05, 0.06])
    g = jnp.array([0.7, 0.0])  # row 1 untouched this batch
    p2, m2, v2 = optimizers.adam_step({"w": w}, {"w": m}, {"w": v},
                                      {"w": g}, jnp.int32(5), cfg,
                                      skip_zero_grad=True)
    assert float(p2["w"][1]) == 2.0
    np.testing.assert_allclose(float(m2["w"][1]), 0.4, rtol=1e-6)
    np.testing.assert_allclose(float(v2["w"][1]), 0.06, rtol=1e-6)
    assert float(p2["w"][0]) != 1.0  # touched row moved


def test_adam_nan_grad_contained():
    cfg = OptimizerConfig(kind="adam", learning_rate=0.1, beta1=0.9,
                          beta2=0.99)
    p2, m2, v2 = optimizers.adam_step(
        {"w": jnp.array([1.0, -1.0])}, {"w": jnp.zeros(2)},
        {"w": jnp.zeros(2)}, {"w": jnp.array([jnp.nan, jnp.inf])},
        jnp.int32(1), cfg)
    assert bool(jnp.all(jnp.isfinite(p2["w"])))
    assert bool(jnp.all(jnp.isfinite(m2["w"])))
    assert bool(jnp.all(jnp.isfinite(v2["w"])))
