"""Precomputed exit-transmittance field tests: analytic golden values and
agreement between the 'field' and 'quadrature' render modes."""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from neuralradiancecaching_tpu.config import VolumeConfig
from neuralradiancecaching_tpu.ops import lightfield, volume
from neuralradiancecaching_tpu.render import pathtrace
from neuralradiancecaching_tpu.scene.camera import pixel_rays
from tests.test_render_nrc import tiny_config, tiny_scene


def test_field_uniform_density_analytic():
    """Uniform sigma: T(p->exit along d) = exp(-sigma * dist_to_exit)."""
    vol = VolumeConfig(grid_shape=(16, 16, 16), box_size=(8.0, 8.0, 8.0),
                       density_factor=0.25)
    grid = jnp.ones((16, 16, 16))
    table = volume.build_corner_table(grid)
    field = lightfield.build_transmittance_field(table, vol, steps=64,
                                                 field_shape=(16, 16, 16))
    # center, +x: distance to exit = 4
    p = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    t = float(lightfield.query_transmittance_field(field, p, d, vol,
                                                   (16, 16, 16))[0])
    # border trilerp thins the last half-voxel; generous tolerance
    assert abs(t - math.exp(-0.25 * 4.0)) < 0.05


def test_field_query_matches_quadrature_randomly():
    rng = np.random.default_rng(0)
    vol = VolumeConfig(grid_shape=(16, 16, 16), box_size=(8.0, 8.0, 8.0),
                       density_factor=0.4)
    grid = jnp.asarray(rng.random((16, 16, 16), dtype=np.float32))
    table = volume.build_corner_table(grid)
    field = lightfield.build_transmittance_field(table, vol, steps=32)

    pos = jnp.asarray(rng.uniform(-3, 3, (256, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(256, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    t_field = lightfield.query_transmittance_field(field, pos, d, vol)
    _, exit_p, _ = volume.entry_exit_points(pos, d, vol.box_size,
                                            vol.box_center)
    t_quad = volume.transmittance(table, pos, exit_p, 32, vol)
    err = np.abs(np.asarray(t_field) - np.asarray(t_quad))
    assert err.mean() < 0.025
    assert np.median(err) < 0.02  # adversarial random-noise density


def test_render_modes_agree():
    """'field' and 'quadrature' renders of the tiny scene agree closely."""
    cfg_f = tiny_config(use_nn=False)
    cfg_q = dataclasses.replace(
        cfg_f, env_map=dataclasses.replace(cfg_f.env_map,
                                           transmittance_mode="quadrature"))
    scene_f = tiny_scene(cfg_f)
    scene_q = tiny_scene(cfg_q)
    ro, rd = pixel_rays(scene_f.camera, 8, 8)
    rgb_f, _ = pathtrace.render_image(scene_f, cfg_f, ro, rd,
                                      jax.random.PRNGKey(3))
    rgb_q, _ = pathtrace.render_image(scene_q, cfg_q, ro, rd,
                                      jax.random.PRNGKey(3))
    a, b = np.asarray(rgb_f), np.asarray(rgb_q)
    # same RNG stream -> same paths; only the T estimate differs
    denom = np.abs(b).mean() + 1e-6
    assert np.abs(a - b).mean() / denom < 0.1


def test_segment_transmittance_field_matches_quadrature():
    rng = np.random.default_rng(2)
    vol = VolumeConfig(grid_shape=(16, 16, 16), box_size=(8.0, 8.0, 8.0),
                       density_factor=0.4)
    # smooth density (real clouds are smooth; random noise is adversarial)
    x = np.linspace(-1, 1, 16, dtype=np.float32)
    gx, gy, gz = np.meshgrid(x, x, x, indexing="ij")
    grid = jnp.asarray(np.exp(-(gx**2 + gy**2 + gz**2) * 2).astype(np.float32))
    table = volume.build_corner_table(grid)
    field = lightfield.build_transmittance_field(table, vol, steps=32)

    a = jnp.asarray(rng.uniform(-3, 3, (512, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-3, 3, (512, 3)).astype(np.float32))
    t_field = lightfield.segment_transmittance_field(field, a, b, vol)
    t_quad = volume.transmittance(table, a, b, 32, vol)
    err = np.abs(np.asarray(t_field) - np.asarray(t_quad))
    assert err.mean() < 0.03, err.mean()
    assert np.median(err) < 0.025


def test_segment_field_zero_length():
    vol = VolumeConfig(grid_shape=(8, 8, 8), box_size=(8.0, 8.0, 8.0))
    table = volume.build_corner_table(jnp.ones((8, 8, 8)))
    field = lightfield.build_transmittance_field(table, vol, steps=8)
    p = jnp.array([[0.0, 0.0, 0.0]])
    t = lightfield.segment_transmittance_field(field, p, p, vol)
    np.testing.assert_allclose(np.asarray(t), 1.0)


def test_premultiplied_mode_agrees():
    """'premultiplied' T*Env rows vs separate field-T + exact env lookup."""
    cfg_f = tiny_config(use_nn=False)
    cfg_p = dataclasses.replace(
        cfg_f, env_map=dataclasses.replace(
            cfg_f.env_map, transmittance_mode="premultiplied"))
    scene_f = tiny_scene(cfg_f)
    scene_p = tiny_scene(cfg_p)
    ro, rd = pixel_rays(scene_f.camera, 8, 8)
    rgb_f, _ = pathtrace.render_image(scene_f, cfg_f, ro, rd,
                                      jax.random.PRNGKey(3))
    rgb_p, _ = pathtrace.render_image(scene_p, cfg_p, ro, rd,
                                      jax.random.PRNGKey(3))
    a, b = np.asarray(rgb_f), np.asarray(rgb_p)
    denom = np.abs(a).mean() + 1e-6
    # same paths; env radiance direction-bucketed -> modest deviation
    assert np.abs(a - b).mean() / denom < 0.15


def test_field_dir_buckets_config_knob():
    """VolumeConfig.field_dir_buckets drives the (theta, phi) resolution of
    the tau field: row count scales, analytic golden value still holds,
    and finer buckets approximate quadrature at least as well as coarse
    ones on a random grid (the r3 bias knob)."""
    rng = np.random.default_rng(3)
    grid = jnp.asarray(rng.random((16, 16, 16), dtype=np.float32))
    table = volume.build_corner_table(grid)
    p = jnp.asarray(rng.uniform(-3, 3, (128, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(128, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    errs = {}
    for buckets in [(8, 16), (32, 64)]:
        vol_b = VolumeConfig(grid_shape=(16, 16, 16),
                             box_size=(8.0, 8.0, 8.0), density_factor=0.4,
                             field_shape=(8, 8, 8),
                             field_dir_buckets=buckets)
        field = lightfield.build_transmittance_field(table, vol_b, steps=64)
        assert field.shape[0] == 8 * 8 * 8 * buckets[0] * buckets[1]
        t_field = lightfield.query_transmittance_field(field, p, d, vol_b)
        _, exit_p, _ = volume.entry_exit_points(p, d, vol_b.box_size,
                                                vol_b.box_center)
        t_quad = volume.transmittance(table, p, exit_p, 64, vol_b)
        errs[buckets] = float(jnp.abs(t_field - t_quad).mean())
    assert errs[(32, 64)] < errs[(8, 16)], errs
    # coarse (8,8,8) voxels dominate the residual on this noisy grid;
    # the ordering above is the knob's contract
    assert errs[(32, 64)] < 0.08, errs


def test_env_cell_integrals_constant_env():
    """env_cell_integrals (r4 exact-cell-power quadrature): a constant env
    integrates to power[q] = c * cell solid angle exactly per cell (the
    equirect rows are uniform in polar theta, so texels never straddle
    cells), total 4*pi*c; centroids are unit and near the cell centers."""
    H, W = 64, 128
    c = 0.7
    env = jnp.full((H, W, 3), c, jnp.float32)
    nt, npin = 8, 16
    power, cdirs = lightfield.env_cell_integrals(env, nt, npin)
    p = np.asarray(power)
    np.testing.assert_allclose(p.sum(axis=0), 4.0 * math.pi * c, rtol=2e-3)
    for it in range(nt):
        t0, t1 = it * math.pi / nt, (it + 1) * math.pi / nt
        expect = (math.cos(t0) - math.cos(t1)) * (2.0 * math.pi / npin) * c
        np.testing.assert_allclose(p[it * npin:(it + 1) * npin, 0], expect,
                                   rtol=0.02)
    cd = np.asarray(cdirs)
    np.testing.assert_allclose(np.linalg.norm(cd, axis=1), 1.0, atol=1e-5)
    # constant env: the luminance-weighted centroid is near the geometric
    # cell center direction
    cth = (np.arange(nt) + 0.5) / nt * math.pi
    cph = ((np.arange(npin) + 0.5) / npin * 2.0 - 1.0) * math.pi
    tt, pp = np.meshgrid(cth, cph, indexing="ij")
    centers = np.asarray(lightfield._dir_from_theta_phi(
        jnp.asarray(tt, jnp.float32), jnp.asarray(pp, jnp.float32)
    )).reshape(-1, 3)
    dots = np.sum(cd * centers, axis=1)
    assert dots.min() > 0.95, dots.min()


def test_env_cell_integrals_delta_emitter():
    """A single bright texel (the horizon-sun aliasing case this
    quadrature fixes): its cell carries exactly the texel's sin-weighted
    power, every other cell is zero, and the cell's centroid points at
    the TEXEL, not the cell center."""
    H, W = 32, 64
    env = np.zeros((H, W, 3), np.float32)
    i, j = 5, 11
    env[i, j] = (10.0, 20.0, 30.0)
    nt, npin = 4, 8
    power, cdirs = lightfield.env_cell_integrals(jnp.asarray(env), nt, npin)
    theta = math.pi * (1.0 - (i + 0.5) / H)
    phi = ((j + 0.5) / W * 2.0 - 1.0) * math.pi
    it = min(int(theta / math.pi * nt), nt - 1)
    ip = min(int((phi / math.pi + 1.0) * 0.5 * npin), npin - 1)
    q = it * npin + ip
    dom = math.sin(theta) * (math.pi / H) * (2.0 * math.pi / W)
    p = np.asarray(power)
    np.testing.assert_allclose(p[q], np.asarray([10.0, 20.0, 30.0]) * dom,
                               rtol=1e-5)
    mask = np.ones(nt * npin, bool)
    mask[q] = False
    assert np.abs(p[mask]).max() == 0.0
    d_tex = np.asarray(lightfield._dir_from_theta_phi(
        jnp.float32(theta), jnp.float32(phi)))
    assert float(np.asarray(cdirs)[q] @ d_tex) > 0.9999
    # dark cells fall back to unit geometric centers
    np.testing.assert_allclose(np.linalg.norm(np.asarray(cdirs), axis=1),
                               1.0, atol=1e-5)


def test_scatter_field_out_buckets_golden_zero_density():
    """build_scatter_field at a custom VolumeConfig.field_out_buckets (r4
    knob): zero density + constant env => the HG-convolved in-scatter
    radiance is the env constant for EVERY voxel and out-bucket
    (HG/(2*pi) integrates to 1 over the sphere), and the corner-packed
    row count scales with the bucket grid."""
    vol = VolumeConfig(grid_shape=(8, 8, 8), box_size=(8.0, 8.0, 8.0),
                       field_out_buckets=(4, 8), field_dir_buckets=(16, 32))
    table = volume.build_corner_table(jnp.zeros((8, 8, 8)))
    env = jnp.full((16, 32, 3), 0.5, jnp.float32)
    f = lightfield.build_scatter_field(table, env, vol, hg_g=0.3, steps=4,
                                       field_shape=(2, 3, 4))
    assert f.shape == (2 * 3 * 4 * 4 * 8, 12)
    np.testing.assert_allclose(np.asarray(f, np.float32), 0.5, rtol=0.03)
