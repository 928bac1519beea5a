"""Generic NN library + Pallas matmul kernel tests (the resurrected
compute/ layer of the reference)."""

import jax
import jax.numpy as jnp
import numpy as np

from neuralradiancecaching_tpu.config import OptimizerConfig
from neuralradiancecaching_tpu.models import nn
from neuralradiancecaching_tpu.ops import pallas_matmul


def test_sequential_forward_shapes():
    net = nn.Sequential([nn.Linear(4, 16), nn.Sigmoid(), nn.Linear(16, 2)])
    params = net.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 4))
    y = net.apply(params, x)
    assert y.shape == (32, 2)
    assert np.isfinite(np.asarray(y)).all()


def test_sequential_trains():
    net = nn.Sequential([nn.Linear(3, 16, init_std=0.3), nn.Relu(),
                         nn.Linear(16, 1, init_std=0.3)])
    params = net.init(jax.random.PRNGKey(0))
    from neuralradiancecaching_tpu.ops import optimizers
    momentum = optimizers.init_momentum(params)
    opt = OptimizerConfig(learning_rate=0.05)
    x = jax.random.uniform(jax.random.PRNGKey(1), (256, 3))
    t = (x.sum(axis=1, keepdims=True)) ** 2

    step = jax.jit(lambda p, m: net.train_step(p, m, x, t, opt))
    losses = []
    for _ in range(200):
        params, momentum, loss = step(params, momentum)
        losses.append(float(loss))
    assert losses[-1] < 0.2 * losses[0]


def test_pallas_matmul_matches_jnp():
    key = jax.random.PRNGKey(2)
    for (m, k, n) in [(64, 64, 64), (300, 200, 100), (512, 512, 512)]:
        a = jax.random.normal(key, (m, k))
        b = jax.random.normal(jax.random.fold_in(key, 1), (k, n))
        out = pallas_matmul.matmul(a, b, interpret=True)
        ref = a @ b
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
