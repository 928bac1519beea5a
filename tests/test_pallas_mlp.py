"""Fused Pallas MLP kernel vs the jnp reference, in interpreter mode on the
CPU test mesh (the compiled kernel itself is exercised on TPU by bench.py
and the TPU smoke script)."""

import jax
import jax.numpy as jnp
import numpy as np

from neuralradiancecaching_tpu.config import MLPConfig
from neuralradiancecaching_tpu.ops import mlp, pallas_mlp


def test_fused_matches_reference_interpret():
    cfg = MLPConfig()
    params = mlp.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (700, 64)) * 0.5
    ref = mlp.apply(params, x, cfg)
    out = pallas_mlp.apply_fused(params, x, cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)


def test_fused_odd_batch_and_padding():
    cfg = MLPConfig(in_features=64, hidden=64, out_features=3, n_layers=3)
    params = mlp.init_params(jax.random.PRNGKey(2), cfg)
    for n in (1, 5, 511, 513):
        x = jax.random.normal(jax.random.PRNGKey(n), (n, 64))
        out = pallas_mlp.apply_fused(params, x, cfg, interpret=True)
        ref = mlp.apply(params, x, cfg)
        assert out.shape == (n, 3)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)


def test_custom_vjp_gradients_match():
    cfg = MLPConfig(in_features=16, hidden=32, out_features=3, n_layers=2,
                    weight_init_std=0.1)
    params = mlp.init_params(jax.random.PRNGKey(3), cfg)
    x = jax.random.normal(jax.random.PRNGKey(4), (64, 16))

    def loss_pallas(p):
        return jnp.sum(pallas_mlp.apply(p, x, cfg) ** 2)

    def loss_ref(p):
        return jnp.sum(mlp.apply(p, x, cfg) ** 2)

    g1 = jax.grad(loss_pallas)(params)
    g2 = jax.grad(loss_ref)(params)
    for k in g2:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   rtol=1e-5, atol=1e-6)
