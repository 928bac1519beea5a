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


def test_adam_lr_scale_scales_update_linearly():
    """lr_scale multiplies the applied update exactly (moments identical:
    the schedule touches only the final w -= lr * upd line)."""
    import jax
    import jax.numpy as jnp

    from neuralradiancecaching_tpu.config import OptimizerConfig
    from neuralradiancecaching_tpu.ops import optimizers

    cfg = OptimizerConfig(kind="adam", learning_rate=0.01, beta1=0.9)
    key = jax.random.PRNGKey(0)
    w = {"w": jax.random.normal(key, (16,))}
    g = {"w": jax.random.normal(jax.random.fold_in(key, 1), (16,))}
    m, v = optimizers.init_adam(w)
    step = jnp.asarray(1, jnp.int32)

    w_full, m1, v1 = optimizers.adam_step(w, m, v, g, step, cfg)
    w_half, m2, v2 = optimizers.adam_step(w, m, v, g, step, cfg,
                                          lr_scale=jnp.asarray(0.5))
    import numpy as np
    np.testing.assert_allclose(np.asarray(m1["w"]), np.asarray(m2["w"]))
    np.testing.assert_allclose(np.asarray(v1["w"]), np.asarray(v2["w"]))
    d_full = np.asarray(w_full["w"] - w["w"])
    d_half = np.asarray(w_half["w"] - w["w"])
    np.testing.assert_allclose(d_half, 0.5 * d_full, rtol=1e-4)


def test_apply_grads_lr_decay_schedule():
    """lr_decay_steps halves the effective lr every decay_steps steps: at
    opt_step == decay_steps the applied MLP update is exactly half the
    undecayed one (exponential schedule, factor^(step/steps))."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from neuralradiancecaching_tpu import config as cfg_mod
    from neuralradiancecaching_tpu.models import nrc

    cfg = cfg_mod.nrc_online_config(32, 32)
    st = nrc.init_state(jax.random.PRNGKey(0), cfg)
    # put the counter exactly at decay_steps - 1 (apply_grads increments
    # before use, so the schedule sees step == decay_steps -> factor^1)
    st = st._replace(opt_step=jnp.asarray(99, st.opt_step.dtype))
    key = jax.random.PRNGKey(1)
    pos = jax.random.uniform(key, (64, 3), minval=-20.0, maxval=20.0)
    d = jax.random.normal(jax.random.fold_in(key, 1), (64, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    target = jnp.abs(jax.random.normal(jax.random.fold_in(key, 2), (64, 3)))
    grads, _ = nrc.compute_grads(st, pos, d, target, cfg)

    cfg_dec = dataclasses.replace(
        cfg, mlp_opt=dataclasses.replace(cfg.mlp_opt, lr_decay_steps=100,
                                         lr_decay_factor=0.5))
    st_plain = nrc.apply_grads(st, grads, cfg)
    st_dec = nrc.apply_grads(st, grads, cfg_dec)
    for name in st.mlp_params:
        d_plain = np.asarray(st_plain.mlp_params[name]
                             - st.mlp_params[name])
        d_dec = np.asarray(st_dec.mlp_params[name] - st.mlp_params[name])
        np.testing.assert_allclose(d_dec, 0.5 * d_plain, rtol=1e-5,
                                   atol=1e-12)
