"""End-to-end render + online NRC training tests on tiny configs."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from neuralradiancecaching_tpu import config as cfg_mod
from neuralradiancecaching_tpu.config import (EnvMapConfig, MLPConfig, NRCConfig,
                                              PathTraceConfig, RenderConfig,
                                              TrainConfig, VolumeConfig,
                                              MRHEConfig)
from neuralradiancecaching_tpu.io import assets
from neuralradiancecaching_tpu.models import nrc
from neuralradiancecaching_tpu.render import frame, pathtrace, targets
from neuralradiancecaching_tpu.scene.camera import pixel_rays
from neuralradiancecaching_tpu.scene.scene import make_scene


def tiny_config(**render_kw) -> NRCConfig:
    return NRCConfig(
        volume=VolumeConfig(grid_shape=(16, 16, 16),
                            box_size=(8.0, 8.0, 8.0)),
        env_map=EnvMapConfig(n_samples=2, transmittance_steps=4),
        path=PathTraceConfig(max_bounces=8, transmittance_steps=4),
        train=TrainConfig(train_width=4, train_height=4, target_samples=2,
                          target_bounces=6),
        mrhe=MRHEConfig(n_levels=4, table_size=512, min_res=4, max_res=32),
        mlp=cfg_mod.MLPConfig(in_features=4 * 2 + 32, hidden=32, n_layers=3),
        render=RenderConfig(width=8, height=8, **render_kw),
    )


def tiny_scene(cfg, density_value=0.5):
    grid = np.full(cfg.volume.grid_shape, density_value, dtype=np.float32)
    env = assets.synthesize_sky(16, 32)
    return make_scene(cfg, grid, env)


def test_zero_density_renders_pure_env():
    """The reference's own analytic shortcut (nrc-forward.frag:848-864):
    no density anywhere => every pixel shows the direct env map."""
    cfg = tiny_config(use_nn=False)
    scene = tiny_scene(cfg, density_value=0.0)
    ro, rd = pixel_rays(scene.camera, 8, 8)
    rgb, trans = pathtrace.render_image(scene, cfg, ro, rd,
                                        jax.random.PRNGKey(0))
    from neuralradiancecaching_tpu.ops import envmap as envmap_ops
    expected = envmap_ops.sample_direct(scene.env, rd, hpm=False)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(expected),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(trans), 1.0)


def test_pathtrace_finite_and_positive():
    cfg = tiny_config(use_nn=False)
    # camera close so most pixels hit the volume (a single center ray can
    # legitimately get RR-trapped at the boundary -- reference-faithful)
    cfg = dataclasses.replace(
        cfg, camera=dataclasses.replace(cfg.camera, position=(0.0, 0.0,
                                                              -12.0)))
    scene = tiny_scene(cfg)
    ro, rd = pixel_rays(scene.camera, 8, 8)
    rgb, trans = pathtrace.render_image(scene, cfg, ro, rd,
                                        jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(rgb)).all()
    assert float(rgb.max()) > 0.0
    assert np.all(np.asarray(trans) >= 0.0) and np.all(np.asarray(trans) <= 1.0)
    # most rays pass through the volume -> attenuated somewhere
    assert float(np.asarray(trans).min()) < 1.0


def test_train_vertex_selection_inside_box():
    cfg = tiny_config()
    scene = tiny_scene(cfg)
    ro, rd = pixel_rays(scene.camera, 4, 4)
    pos, d = targets.choose_train_vertices(scene, cfg, ro, rd,
                                           jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(pos)).all()
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0,
                               rtol=1e-4)
    half = np.asarray(cfg.volume.box_size) / 2
    assert np.all(np.abs(np.asarray(pos)) <= half + 1.0)


def test_generate_train_batch_shapes_and_clamp():
    cfg = tiny_config()
    scene = tiny_scene(cfg)
    batch = targets.generate_train_batch(scene, cfg, jax.random.PRNGKey(1))
    assert batch.pos.shape == (16, 3)
    assert batch.target.shape == (16, 3)
    assert np.isfinite(np.asarray(batch.target)).all()
    assert float(batch.target.max()) <= cfg.train.target_clamp


def test_nrc_query_shapes():
    cfg = tiny_config()
    state = nrc.init_state(jax.random.PRNGKey(0), cfg)
    pos = jnp.zeros((7, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (7, 1))
    out = nrc.query(state, pos, d, cfg)
    assert out.shape == (7, 3)
    assert float(out.min()) >= 0.0  # output ReLU


def test_nrc_online_training_reduces_loss():
    """The cache must fit a fixed synthetic radiance field."""
    cfg = tiny_config()
    # boosted lr for a fast smoke test (reference defaults converge too,
    # just over more frames than a unit test should run)
    cfg = dataclasses.replace(
        cfg, mlp_opt=cfg_mod.OptimizerConfig(learning_rate=0.01),
        mrhe=dataclasses.replace(cfg.mrhe, learning_rate=0.05))
    state = nrc.init_state(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)
    pos = jax.random.uniform(key, (512, 3), minval=-4.0, maxval=4.0)
    d = jax.random.normal(jax.random.PRNGKey(2), (512, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    # smooth positive target field
    target = jnp.stack([
        0.5 + 0.4 * jnp.sin(pos[:, 0]),
        0.5 + 0.4 * jnp.cos(pos[:, 1] + d[:, 1]),
        0.5 + 0.4 * jnp.sin(pos[:, 2] * 0.5),
    ], axis=-1)

    step = jax.jit(lambda s: nrc.train_step(s, pos, d, target, cfg),
                   static_argnames=())
    mses = []
    for _ in range(200):
        state, mse = step(state)
        mses.append(float(mse))
    assert mses[-1] < 0.4 * mses[0]
    assert np.isfinite(mses).all()


def test_frame_step_end_to_end():
    cfg = tiny_config(use_nn=True)
    scene = tiny_scene(cfg)
    state = nrc.init_state(jax.random.PRNGKey(0), cfg)
    state, out = frame.frame_step(state, scene, jax.random.PRNGKey(1), cfg)
    assert out.image.shape == (8, 8, 3)
    assert np.isfinite(np.asarray(out.image)).all()
    assert np.isfinite(float(out.mse))
    # second frame reuses the compiled program
    state, out2 = frame.frame_step(state, scene, jax.random.PRNGKey(2), cfg)
    assert np.isfinite(np.asarray(out2.image)).all()


def test_presets_construct():
    for preset in [cfg_mod.mnist_config(), cfg_mod.image_fit_config(),
                   cfg_mod.pathtrace_config(), cfg_mod.nrc_online_config(),
                   cfg_mod.progressive_1080p_config()]:
        assert isinstance(preset, NRCConfig)
        assert hash(preset) is not None  # static-arg usable


def test_scatter_field_matches_mc_expectation():
    """The baked HG-convolved in-scatter field (in_scatter_mode='field') is
    the expectation of the reference's phase-sampled env estimator
    (nrc-forward.frag:710-749): means must agree closely and the pointwise
    discretization error must undercut the 8-sample estimator's noise."""
    cfg = tiny_config()
    cfg_f = dataclasses.replace(
        cfg, env_map=dataclasses.replace(cfg.env_map, in_scatter_mode="field",
                                         transmittance_steps=8))
    cfg_mc = dataclasses.replace(
        cfg, env_map=dataclasses.replace(cfg.env_map,
                                         transmittance_steps=8))
    # smooth non-uniform density so T varies
    ax = np.linspace(-1, 1, 16, dtype=np.float32)
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    grid = np.clip(0.6 - 0.5 * (gx**2 + gy**2 + gz**2), 0, None)
    env = assets.synthesize_sky(16, 32)
    scene = make_scene(cfg_f, grid, env)

    rng = np.random.default_rng(3)
    pts = jnp.asarray((rng.random((512, 3), dtype=np.float32) - 0.5) * 6.0)
    dirs = rng.normal(size=(512, 3)).astype(np.float32)
    dirs = jnp.asarray(dirs / np.linalg.norm(dirs, axis=-1, keepdims=True))

    lf = np.asarray(pathtrace.trace_scene(scene, cfg_f, pts, dirs,
                                          jax.random.PRNGKey(0),
                                          env_samples=1))
    lm = np.asarray(pathtrace.trace_scene(scene, cfg_mc, pts, dirs,
                                          jax.random.PRNGKey(1),
                                          env_samples=256))
    assert np.isfinite(lf).all() and (lf >= 0).all()
    mean_rel = abs(lf.mean() - lm.mean()) / lm.mean()
    assert mean_rel < 0.05, mean_rel
    per_point = (np.abs(lf - lm).mean(-1)
                 / (np.abs(lm).mean(-1) + 1e-6))
    assert np.median(per_point) < 0.25, np.median(per_point)


def test_render_banded_matches_tiled():
    from neuralradiancecaching_tpu.render.tiled import (render_banded,
                                                        render_tiled)
    cfg = tiny_config(use_nn=True)
    cfg = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, width=8, height=8))
    scene = tiny_scene(cfg)
    state = nrc.init_state(jax.random.PRNGKey(0), cfg)
    k = jax.random.PRNGKey(5)
    a = np.asarray(render_tiled(state, scene, k, cfg, band_rows=4))
    b = np.asarray(render_banded(state, scene, k, cfg, band_rows=4))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_render_banded_in_program_spp():
    """spp > 1 runs INSIDE the banded program (virtual-ray expansion,
    reference TracePathMultiple nrc-forward.frag:824-834): finite, right
    shape, and consistent with the 1-spp estimator's mean within MC
    tolerance; with the collision sampler so deferred events flow too."""
    from neuralradiancecaching_tpu.render.tiled import render_banded
    cfg = tiny_config(use_nn=True)
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(cfg.render, width=8, height=8, spp=4),
        path=dataclasses.replace(cfg.path, sampler="collision",
                                 collision_field_steps=8),
        env_map=dataclasses.replace(cfg.env_map, in_scatter_mode="field"),
        volume=dataclasses.replace(cfg.volume, field_shape=(4, 4, 4)))
    scene = tiny_scene(cfg)
    state = nrc.init_state(jax.random.PRNGKey(0), cfg)
    img4 = np.asarray(render_banded(state, scene, jax.random.PRNGKey(5),
                                    cfg, band_rows=4))
    assert img4.shape == (8, 8, 3)
    assert np.isfinite(img4).all()

    cfg1 = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, spp=1))
    acc = np.zeros_like(img4)
    for i in range(4):
        acc += np.asarray(render_banded(state, scene,
                                        jax.random.PRNGKey(50 + i), cfg1,
                                        band_rows=4))
    acc /= 4
    # same estimator, independent keys: means agree within MC noise
    rel = abs(img4.mean() - acc.mean()) / max(acc.mean(), 1e-6)
    assert rel < 0.15, (img4.mean(), acc.mean())


def test_live_strength_retune_no_recompile():
    """Light/env strengths are TRACED scene scalars (the ImGui-slider
    capability, VolumeData.cpp:116-128 / HdrEnvMap.cpp:259-279): changing
    them between frames reuses the compiled frame program and changes the
    image."""
    from neuralradiancecaching_tpu.render import frame as frame_mod
    cfg = tiny_config(use_nn=True)
    scene = tiny_scene(cfg)
    state = nrc.init_state(jax.random.PRNGKey(0), cfg)
    state, out0 = frame_mod.frame_step(state, scene, jax.random.PRNGKey(1),
                                       cfg)
    n_compiled = frame_mod.frame_step._cache_size()
    scene2 = scene._replace(env=scene.env._replace(
        hpm_strength=scene.env.hpm_strength * 3.0,
        direct_strength=scene.env.direct_strength * 3.0))
    state, out1 = frame_mod.frame_step(state, scene2, jax.random.PRNGKey(1),
                                       cfg)
    assert frame_mod.frame_step._cache_size() == n_compiled
    assert float(jnp.abs(out1.image - out0.image).max()) > 0.0


def test_bf16_query_matches_f32_within_tolerance():
    """MLPConfig.inference_dtype='bfloat16' (bf16 lerp weights + blob +
    MLP; f32 index math) must track the f32 query to bf16 rounding scale
    (measured on-device: mean 0.05% / p99 0.25% rel err) and leave
    training state untouched."""
    import dataclasses

    from neuralradiancecaching_tpu.models import nrc

    cfg = tiny_config(use_nn=True)
    state = nrc.init_state(jax.random.PRNGKey(0), cfg)
    baked = nrc.bake(state, cfg)
    k = jax.random.PRNGKey(3)
    pos = (jax.random.uniform(k, (256, 3)) - 0.5) \
        * jnp.asarray(cfg.volume.box_size)
    d = jax.random.normal(jax.random.fold_in(k, 1), (256, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    a = np.asarray(nrc.query_baked(state, baked, pos, d, cfg))
    cfg_bf = dataclasses.replace(
        cfg, mlp=dataclasses.replace(cfg.mlp, inference_dtype="bfloat16"))
    b = np.asarray(nrc.query_baked(state, baked, pos, d, cfg_bf))
    assert b.dtype == np.float32
    np.testing.assert_allclose(b, a, rtol=0.03, atol=0.03)
    # sanity: not bit-identical (the bf16 path really ran)
    assert (a != b).any()


def test_query_split_mlp_matches_unsplit():
    """MLP hoist parity (RenderConfig.query_split_mlp): the chunked query
    with per-chunk encode + ONE frame-wide MLP returns the same image as
    the per-chunk full query -- both shade_and_query branches (capped
    compaction and uncapped full-width) exercised via a tiny query_chunk
    so multiple chunks run."""
    from neuralradiancecaching_tpu.render.tiled import render_banded
    base = tiny_config(use_nn=True)
    base = dataclasses.replace(
        base,
        render=dataclasses.replace(base.render, width=16, height=16,
                                   query_chunk=32),
        path=dataclasses.replace(base.path, sampler="collision",
                                 collision_field_steps=8),
        env_map=dataclasses.replace(base.env_map, in_scatter_mode="field"),
        volume=dataclasses.replace(base.volume, field_shape=(4, 4, 4)))
    scene = tiny_scene(base)
    state = nrc.init_state(jax.random.PRNGKey(0), base)
    k = jax.random.PRNGKey(5)
    for cap in (1.0, 0.5):  # uncapped chunked / capped compaction
        c_on = dataclasses.replace(base, render=dataclasses.replace(
            base.render, query_cap_fraction=cap, query_split_mlp=True))
        c_off = dataclasses.replace(base, render=dataclasses.replace(
            base.render, query_cap_fraction=cap, query_split_mlp=False))
        a = np.asarray(render_banded(state, scene, k, c_on, band_rows=8))
        b = np.asarray(render_banded(state, scene, k, c_off, band_rows=8))
        assert np.isfinite(a).all()
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)
