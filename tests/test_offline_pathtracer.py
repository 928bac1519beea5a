"""Offline path tracer (path-tracer.frag equivalent) + misc utils tests."""

import jax
import jax.numpy as jnp
import numpy as np

from neuralradiancecaching_tpu.config import MLPConfig, VolumeConfig
from neuralradiancecaching_tpu.ops import mlp, volume
from neuralradiancecaching_tpu.render import offline_pathtracer as opt
from neuralradiancecaching_tpu.scene.camera import pixel_rays, make_camera
from neuralradiancecaching_tpu.config import CameraConfig


def _setup():
    vol = VolumeConfig(grid_shape=(16, 16, 16), box_size=(8.0, 8.0, 8.0))
    grid = jnp.full((16, 16, 16), 0.5, dtype=jnp.float32)
    field = volume.build_corner_table(grid)
    cfg = opt.OfflinePTConfig(max_bounces=8, transmittance_steps=4,
                              shadow_samples=6)
    cam = make_camera(CameraConfig(position=(0, 0, -20)))
    ro, rd = pixel_rays(cam, 8, 8)
    return field, vol, cfg, ro, rd


def test_offline_pt_runs_and_exports():
    field, vol, cfg, ro, rd = _setup()
    sun = np.array([0.0, -1.0, 0.0], np.float32)
    res = opt.trace(field, vol, cfg, sun, 1.0, ro, rd, jax.random.PRNGKey(0))
    assert res.color.shape == (64, 3)
    assert res.export_pos.shape == (64, 3)
    assert res.export_dir.shape == (64, 2)
    assert np.isfinite(np.asarray(res.color)).all()
    assert float(res.color.max()) > 0.0
    # export angles in valid ranges: theta in [-pi, pi], phi in [0, pi]
    d = np.asarray(res.export_dir)
    assert d[:, 0].min() >= -np.pi - 1e-5 and d[:, 0].max() <= np.pi + 1e-5
    assert d[:, 1].min() >= -1e-5 and d[:, 1].max() <= np.pi + 1e-5


def test_offline_pt_miss_is_black():
    field, vol, cfg, _, _ = _setup()
    ro = jnp.array([[0.0, 50.0, 0.0]])
    rd = jnp.array([[0.0, 1.0, 0.0]])  # pointing away
    res = opt.trace(field, vol, cfg, np.array([0, -1, 0], np.float32), 1.0,
                    ro, rd, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(res.color), 0.0)


def test_self_shadowing_denser_is_darker():
    vol = VolumeConfig(grid_shape=(8, 8, 8), box_size=(8.0, 8.0, 8.0),
                       density_factor=1.0)
    cfg = opt.OfflinePTConfig()
    thin = volume.build_corner_table(jnp.full((8, 8, 8), 0.05))
    thick = volume.build_corner_table(jnp.full((8, 8, 8), 0.9))
    pos = jnp.array([[0.0, 0.0, 0.0]])
    sun = jnp.array([0.0, -1.0, 0.0])
    t_thin = float(opt.self_shadowing(thin, pos, sun, vol, cfg)[0])
    t_thick = float(opt.self_shadowing(thick, pos, sun, vol, cfg)[0])
    assert 0.0 <= t_thick < t_thin <= 1.0


def test_sigmoid_activation_option():
    cfg = MLPConfig(in_features=8, hidden=16, out_features=3, n_layers=2,
                    activation="sigmoid", output_relu=True,
                    weight_init_std=0.5)
    params = mlp.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 8))
    y = mlp.apply(params, x, cfg)
    assert np.asarray(y).min() >= 0.0 and np.asarray(y).max() <= 1.0


def test_dump_weights():
    from neuralradiancecaching_tpu.models import nrc
    from tests.test_render_nrc import tiny_config
    state = nrc.init_state(jax.random.PRNGKey(0), tiny_config())
    text = nrc.dump_weights(state)
    assert "w0" in text and "hash" in text and "std=" in text
