"""MLP shape/init/loss tests + a tiny supervised convergence check."""

import jax
import jax.numpy as jnp
import numpy as np

from neuralradiancecaching_tpu.config import MLPConfig, OptimizerConfig
from neuralradiancecaching_tpu.ops import mlp, optimizers


def test_init_shapes_and_stats():
    cfg = MLPConfig()
    params = mlp.init_params(jax.random.PRNGKey(0), cfg)
    assert params["w0"].shape == (64, 64)
    assert params["w5"].shape == (64, 3)
    assert params["b5"].shape == (3,)
    # N(0, 0.01^2) init (NeuralRadianceCache.cpp:629-645)
    assert abs(float(params["w0"].std()) - 0.01) < 0.002
    # biases zero (quirk #1 fixed)
    assert float(jnp.abs(params["b0"]).max()) == 0.0


def test_forward_output_relu():
    cfg = MLPConfig()
    params = mlp.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (17, 64))
    y = mlp.apply(params, x, cfg)
    assert y.shape == (17, 3)
    assert float(y.min()) >= 0.0  # output ReLU (nrc-forward.frag:482-489)


def test_loss_gradient_is_2err_over_batch():
    """d loss / d pred must equal 2*(pred-target)/B per channel
    (nrc-train.comp:1010-1012 with ONE_OVER_PIXEL_COUNT batch norm)."""
    cfg = MLPConfig(n_layers=1, in_features=3, out_features=3,
                    output_relu=False)
    # identity-ish params: w = I, b = 0
    params = {"w0": jnp.eye(3), "b0": jnp.zeros(3)}
    x = jnp.array([[1.0, 2.0, 3.0], [0.5, 0.5, 0.5]])
    t = jnp.zeros((2, 3))

    def loss_fn(p):
        return mlp.nrc_loss(p, x, t, cfg)[0]

    g = jax.grad(loss_fn)(params)
    # dL/dw = x^T @ (2 err / B); err = x
    expected = x.T @ (2 * x / 2)
    np.testing.assert_allclose(np.asarray(g["w0"]), np.asarray(expected),
                               rtol=1e-5)


def test_valid_mask_zeroes_contribution():
    cfg = MLPConfig()
    params = mlp.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 64))
    t = jnp.ones((8, 3))
    valid = jnp.array([True] * 4 + [False] * 4)
    x_bad = x.at[4:].set(jnp.nan)
    loss, mse = mlp.nrc_loss(params, x_bad, t, cfg, valid=valid)
    assert bool(jnp.isfinite(loss))
    assert bool(jnp.isfinite(mse))


def test_supervised_convergence_with_guarded_sgd():
    """End-to-end sanity: the guarded momentum-SGD drives the NRC loss down
    on a small regression problem (the MNIST-style training loop skeleton)."""
    cfg = MLPConfig(in_features=8, hidden=32, out_features=3, n_layers=3,
                    output_relu=True, weight_init_std=0.1)
    opt = OptimizerConfig(learning_rate=0.02, beta1=0.5)
    key = jax.random.PRNGKey(42)
    params = mlp.init_params(key, cfg)
    mom = optimizers.init_momentum(params)

    x = jax.random.uniform(jax.random.PRNGKey(1), (256, 8))
    w_true = jax.random.uniform(jax.random.PRNGKey(2), (8, 3))
    t = x @ w_true  # positive targets, reachable through output ReLU

    @jax.jit
    def step(params, mom):
        (loss, _), grads = jax.value_and_grad(
            lambda p: mlp.nrc_loss(p, x, t, cfg), has_aux=True)(params)
        params, mom = optimizers.momentum_sgd_step(params, mom, grads, opt)
        return params, mom, loss

    losses = []
    for _ in range(300):
        params, mom, loss = step(params, mom)
        losses.append(float(loss))
    assert losses[-1] < 0.05 * losses[0]
