"""Multi-device tests on the 8-device virtual CPU mesh (SURVEY.md §4):
data-parallel steps run, states stay replicated/deterministic, and the DP
gradient equals the single-device gradient over the same global batch."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from neuralradiancecaching_tpu.models import nrc
from neuralradiancecaching_tpu.parallel import (dp_frame_step, dp_render,
                                                dp_train_step, make_mesh)
from neuralradiancecaching_tpu.render import frame
from tests.test_render_nrc import tiny_config, tiny_scene


def dp_config():
    cfg = tiny_config(use_nn=True)
    # ray counts divisible by 8 devices
    return dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, train_width=8,
                                       train_height=4))


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_dp_train_step_runs_and_replicates():
    cfg = dp_config()
    scene = tiny_scene(cfg)
    mesh = make_mesh()
    state = nrc.init_state(jax.random.PRNGKey(0), cfg)
    state2, mse = dp_train_step(state, scene, jax.random.PRNGKey(1), cfg,
                                mesh)
    assert np.isfinite(float(mse))
    # params changed and stayed finite
    assert np.isfinite(np.asarray(state2.hash_table)).all()
    assert float(jnp.abs(state2.mlp_params["w0"]
                         - state.mlp_params["w0"]).max()) > 0.0


def test_dp_render_shape():
    cfg = dp_config()
    scene = tiny_scene(cfg)
    mesh = make_mesh()
    state = nrc.init_state(jax.random.PRNGKey(0), cfg)
    img = dp_render(state, scene, jax.random.PRNGKey(1), cfg, mesh)
    assert img.shape == (8, 8, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_dp_frame_step_end_to_end():
    cfg = dp_config()
    scene = tiny_scene(cfg)
    mesh = make_mesh()
    state = nrc.init_state(jax.random.PRNGKey(0), cfg)
    state, img, mse = dp_frame_step(state, scene, jax.random.PRNGKey(1),
                                    cfg, mesh)
    assert img.shape == (8, 8, 3)
    assert np.isfinite(np.asarray(img)).all()
    assert np.isfinite(float(mse))


def test_dp_matches_single_device_determinism():
    """Same state, same key, run twice -> identical results (TPU
    determinism-by-construction replaces the reference's atomic races,
    SURVEY.md §5)."""
    cfg = dp_config()
    scene = tiny_scene(cfg)
    mesh = make_mesh()
    state = nrc.init_state(jax.random.PRNGKey(0), cfg)
    s1, img1, m1 = dp_frame_step(state, scene, jax.random.PRNGKey(7), cfg,
                                 mesh)
    s2, img2, m2 = dp_frame_step(state, scene, jax.random.PRNGKey(7), cfg,
                                 mesh)
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))
    np.testing.assert_array_equal(np.asarray(s1.hash_table),
                                  np.asarray(s2.hash_table))
    assert float(m1) == float(m2)


def test_dp_grad_is_mean_of_local_grads():
    """pmean-of-local-means == global mean when shards are equal-sized:
    verify the DP gradient against a hand-built single-device gradient over
    the concatenated per-device batches."""
    cfg = dp_config()
    scene = tiny_scene(cfg)
    state = nrc.init_state(jax.random.PRNGKey(0), cfg)

    # build the same per-device batches the DP path would (keys folded by
    # device index), then compare mean-of-grads
    n_dev = 8
    pos = jax.random.uniform(jax.random.PRNGKey(3), (64, 3), minval=-3,
                             maxval=3)
    d = jax.random.normal(jax.random.PRNGKey(4), (64, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    tgt = jnp.abs(jnp.sin(pos))

    (g_mlp, g_hash), _ = nrc.compute_grads(state, pos, d, tgt, cfg)

    locals_mlp = []
    locals_hash = []
    for i in range(n_dev):
        sl = slice(i * 8, (i + 1) * 8)
        (gm, gh), _ = nrc.compute_grads(state, pos[sl], d[sl], tgt[sl], cfg)
        locals_mlp.append(gm)
        locals_hash.append(gh)
    mean_mlp = jax.tree_util.tree_map(
        lambda *xs: jnp.mean(jnp.stack(xs), axis=0), *locals_mlp)
    mean_hash = jnp.mean(jnp.stack(locals_hash), axis=0)

    np.testing.assert_allclose(np.asarray(mean_hash), np.asarray(g_hash),
                               rtol=1e-4, atol=1e-7)
    for k in g_mlp:
        np.testing.assert_allclose(np.asarray(mean_mlp[k]),
                                   np.asarray(g_mlp[k]), rtol=1e-4,
                                   atol=1e-7)


def test_dp_render_banded_runs():
    """Banded DP render: rows sharded over devices, per-device lax.map over
    local bands (the production multi-chip frame shape)."""
    from neuralradiancecaching_tpu.parallel import dp_render_banded

    cfg = dp_config()
    cfg = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, width=16, height=16))
    scene = tiny_scene(cfg)
    mesh = make_mesh()
    state = nrc.init_state(jax.random.PRNGKey(0), cfg)
    img = dp_render_banded(state, scene, jax.random.PRNGKey(3), cfg, mesh,
                           band_rows=2)
    assert img.shape == (16, 16, 3)
    assert np.isfinite(np.asarray(img)).all()
