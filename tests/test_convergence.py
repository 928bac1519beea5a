"""Fidelity: online-NRC render must converge toward the no-cache reference
render (the BASELINE 'RMSE vs converged no-cache' metric, and the de-facto
correctness check the reference does by eye with its useNN toggle,
SURVEY.md §4)."""

import dataclasses

import jax
import numpy as np

from neuralradiancecaching_tpu import config as cfg_mod
from neuralradiancecaching_tpu.models import nrc
from neuralradiancecaching_tpu.render import frame, targets
from neuralradiancecaching_tpu.utils.metrics import relative_rmse
from tests.test_render_nrc import tiny_config, tiny_scene


def test_nrc_render_approaches_no_cache():
    base = tiny_config(use_nn=True)
    cfg = dataclasses.replace(
        base,
        # boosted lr for test-speed convergence
        mlp_opt=cfg_mod.OptimizerConfig(learning_rate=0.01),
        mrhe=dataclasses.replace(base.mrhe, learning_rate=0.05),
        train=dataclasses.replace(base.train, train_width=16,
                                  train_height=16, target_samples=4),
        # closer camera so most pixels see the volume (stronger signal)
        camera=dataclasses.replace(base.camera, position=(0.0, 0.0, -12.0)),
    )
    scene = tiny_scene(cfg)
    state = nrc.init_state(jax.random.PRNGKey(0), cfg)

    # online training (train pass only, like warming the cache)
    for i in range(200):
        state, mse = frame.train_only_step(state, scene,
                                           jax.random.PRNGKey(10 + i), cfg)

    # converged no-cache reference: many independent 1-spp renders averaged
    cfg_ref = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, use_nn=False))
    ref = np.zeros((8, 8, 3), np.float32)
    n_ref = 32
    for i in range(n_ref):
        _, out = frame.frame_step(state, scene, jax.random.PRNGKey(100 + i),
                                  cfg_ref, train=False)
        ref += np.asarray(out.image)
    ref /= n_ref

    # NRC render, averaged over fewer samples (the cache smooths variance)
    img = np.zeros_like(ref)
    n_img = 32
    for i in range(n_img):
        _, out = frame.frame_step(state, scene, jax.random.PRNGKey(500 + i),
                                  cfg, train=False)
        img += np.asarray(out.image)
    img /= n_img

    err_trained = relative_rmse(img, ref)

    # sanity floor: an untrained cache must be clearly worse
    state0 = nrc.init_state(jax.random.PRNGKey(3), cfg)
    img0 = np.zeros_like(ref)
    for i in range(8):
        _, out = frame.frame_step(state0, scene, jax.random.PRNGKey(900 + i),
                                  cfg, train=False)
        img0 += np.asarray(out.image)
    img0 /= 8
    err_untrained = relative_rmse(img0, ref)

    assert np.isfinite(err_trained)
    # tiny test model (32-hidden, 4 MRHE levels, 200 steps): the bound here
    # checks the estimator wiring, not production quality
    assert err_trained < 0.55, (err_trained, err_untrained)
    assert err_trained < 0.9 * err_untrained, (err_trained, err_untrained)


def test_train_targets_match_render_radiance_scale():
    """Targets generated for training live on the same radiance scale as the
    no-cache render (both use the render-side TraceScene with env light)."""
    cfg = tiny_config(use_nn=False)
    scene = tiny_scene(cfg)
    batch = targets.generate_train_batch(scene, cfg, jax.random.PRNGKey(0))
    t = np.asarray(batch.target)
    assert np.isfinite(t).all()
    assert t.min() >= 0.0
    # nonzero learning signal with default env-lit config
    assert t.max() > 0.0
