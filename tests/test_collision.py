"""Collision field (ops/collision.py): build correctness, inverse-CDF
sampling, and the collision-sampler render path."""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from neuralradiancecaching_tpu.config import (EnvMapConfig, NRCConfig,
                                              PathTraceConfig, RenderConfig,
                                              VolumeConfig)
from neuralradiancecaching_tpu.io import assets
from neuralradiancecaching_tpu.ops import collision
from neuralradiancecaching_tpu.ops import volume as vol_ops
from neuralradiancecaching_tpu.ops.lightfield import (N_PHI, N_THETA,
                                                      _dir_from_theta_phi)
from neuralradiancecaching_tpu.render import pathtrace
from neuralradiancecaching_tpu.scene.camera import pixel_rays
from neuralradiancecaching_tpu.scene.scene import make_scene
from tests.test_render_nrc import tiny_config, tiny_scene


def _coll_config(**render_kw):
    cfg = tiny_config(**render_kw)
    return dataclasses.replace(
        cfg, path=dataclasses.replace(cfg.path, sampler="collision",
                                      collision_field_steps=32))


def bucket_center_dir(it: int, ip: int) -> np.ndarray:
    th = (it + 0.5) / N_THETA * math.pi
    ph = ((ip + 0.5) / N_PHI * 2.0 - 1.0) * math.pi
    return np.asarray(_dir_from_theta_phi(jnp.float32(th), jnp.float32(ph)))


def test_field_tau_matches_quadrature_uniform_box():
    """Uniform density: tau(vox -> exit) = sigma * chord length, and the
    quantile knots are linear in q (cumulative tau is linear)."""
    vol = VolumeConfig(grid_shape=(16, 16, 16), box_size=(8.0, 8.0, 8.0))
    grid = jnp.full(vol.grid_shape, 0.5, dtype=jnp.float32)
    table = vol_ops.build_corner_table(grid)
    field = collision.build_collision_field(table, vol, steps=64,
                                            field_shape=(8, 8, 8))

    # voxel center near the box center, bucket-center direction (no
    # direction-interp error at bucket centers)
    it, ip = 7, 4
    d = bucket_center_dir(it, ip)
    pos = jnp.asarray([[0.1, 0.1, 0.1]], jnp.float32)
    dn = jnp.asarray(d, jnp.float32)[None, :]

    tau, knots = collision.query_collision_rows(field, pos, dn, vol,
                                                field_shape=(8, 8, 8))
    # compare against direct quadrature from the FIELD's voxel center
    vox_center = (jnp.floor((pos / jnp.asarray(vol.box_size) + 0.5) * 8)
                  + 0.5) / 8
    vc = (vox_center - 0.5) * jnp.asarray(vol.box_size)
    _, exit_p, _ = vol_ops.entry_exit_points(vc, dn, vol.box_size,
                                             vol.box_center)
    t_ref = vol_ops.transmittance(table, vc, exit_p, 64, vol)
    tau_ref = -np.log(np.asarray(t_ref))
    np.testing.assert_allclose(np.asarray(tau)[0], tau_ref[0], rtol=0.08)

    # knots linear in q for uniform density: t(q) = q * chord
    k = np.asarray(knots)[0]
    chord = k[-1]
    assert chord > 0
    np.testing.assert_allclose(k, np.linspace(0, 1, collision.N_KNOTS)
                               * chord, atol=0.15 * chord + 1e-4)


def test_sampled_distance_inverts_cumulative_tau():
    """On a nonuniform profile the sampled distance t(u) must satisfy
    tau(0 -> t) ~= tau* = -log1p(-u * p_scatter) (the exact inverse-CDF
    property), verified by independent quadrature along the same ray."""
    vol = VolumeConfig(grid_shape=(16, 16, 16), box_size=(8.0, 8.0, 8.0))
    rng = np.random.default_rng(0)
    # smooth blobby grid
    x = np.linspace(-1, 1, 16)
    gx, gy, gz = np.meshgrid(x, x, x, indexing="ij")
    grid = np.exp(-4 * (gx ** 2 + gy ** 2 + gz ** 2)).astype(np.float32) * 2
    table = vol_ops.build_corner_table(jnp.asarray(grid))
    field = collision.build_collision_field(table, vol, steps=64,
                                            field_shape=(8, 8, 8))

    it, ip = 8, 20
    d = bucket_center_dir(it, ip)
    # sample FROM the field voxel center so position discretization vanishes
    vc = ((np.floor((np.array([0.07, -0.12, 0.19]) /
                     np.asarray(vol.box_size) + 0.5) * 8) + 0.5) / 8 - 0.5) \
        * np.asarray(vol.box_size)
    pos = jnp.asarray(vc, jnp.float32)[None, :]
    dn = jnp.asarray(d, jnp.float32)[None, :]

    tau, _ = collision.query_collision_rows(field, pos, dn, vol,
                                            field_shape=(8, 8, 8))
    tau = float(np.asarray(tau)[0])
    assert tau > 0.3  # the blob is in the way

    for u in (0.05, 0.3, 0.6, 0.9, 0.99):
        uu = jnp.asarray([u], jnp.float32)
        t, p_sc = collision.sample_collision(field, pos, dn, uu, vol,
                                             field_shape=(8, 8, 8))
        tau_star = -math.log1p(-u * float(np.asarray(p_sc)[0]))
        x_t = pos + t[:, None] * dn
        t_seg = vol_ops.transmittance(table, pos, x_t, 96, vol)
        tau_meas = -float(np.log(np.asarray(t_seg)[0]))
        assert abs(tau_meas - tau_star) < 0.12 * tau + 0.03, (
            u, tau_meas, tau_star)


def test_knots_monotone_and_p_scatter_zero_outside():
    vol = VolumeConfig(grid_shape=(8, 8, 8), box_size=(4.0, 4.0, 4.0))
    grid = jnp.zeros(vol.grid_shape, jnp.float32).at[2:6, 2:6, 2:6].set(1.0)
    table = vol_ops.build_corner_table(grid)
    field = collision.build_collision_field(table, vol, steps=32,
                                            field_shape=(4, 4, 4))
    rows = np.asarray(field)
    knots = rows[:, 4:]
    assert (np.diff(knots, axis=1) >= -1e-5).all()
    # some buckets see no density at all -> tau = 0 rows exist
    assert (rows[:, 0] == 0).any() and (rows[:, 0] > 0).any()


def test_collision_render_zero_density_pure_env():
    cfg = _coll_config(use_nn=False)
    scene = tiny_scene(cfg, density_value=0.0)
    ro, rd = pixel_rays(scene.camera, 8, 8)
    rgb, trans = pathtrace.render_image(scene, cfg, ro, rd,
                                        jax.random.PRNGKey(0))
    from neuralradiancecaching_tpu.ops import envmap as envmap_ops
    expected = envmap_ops.sample_direct(scene.env, rd, hpm=False)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(expected),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(trans), 1.0)


def test_collision_render_finite_attenuated_deterministic():
    cfg = _coll_config(use_nn=False)
    cfg = dataclasses.replace(
        cfg, camera=dataclasses.replace(cfg.camera,
                                        position=(0.0, 0.0, -12.0)))
    scene = tiny_scene(cfg)
    ro, rd = pixel_rays(scene.camera, 8, 8)
    rgb, trans = pathtrace.render_image(scene, cfg, ro, rd,
                                        jax.random.PRNGKey(0))
    rgb2, _ = pathtrace.render_image(scene, cfg, ro, rd,
                                     jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(rgb)).all()
    assert float(rgb.max()) > 0.0
    t = np.asarray(trans)
    assert (t >= 0).all() and (t <= 1).all() and t.min() < 1.0
    np.testing.assert_array_equal(np.asarray(rgb), np.asarray(rgb2))


def test_collision_trace_records_queries():
    cfg = _coll_config(use_nn=True)
    cfg = dataclasses.replace(
        cfg, camera=dataclasses.replace(cfg.camera,
                                        position=(0.0, 0.0, -12.0)))
    scene = tiny_scene(cfg, density_value=2.0)
    ro, rd = pixel_rays(scene.camera, 8, 8)
    res = pathtrace.trace_path(scene, cfg, ro, rd, jax.random.PRNGKey(1),
                               use_nn=True)
    qw = np.asarray(res.query_weight)
    assert (qw >= 0).all() and qw.max() > 0  # dense volume -> RR cuts fire
    # query weights are analytic scatter-probability products <= 1
    assert qw.max() <= 1.0 + 1e-5
    inside = np.abs(np.asarray(res.query_pos)) <= (
        np.asarray(cfg.volume.box_size) * 0.5 + 1e-3)
    assert inside[qw > 0].all()


def test_collision_train_batch_and_frame_step():
    """Online training end-to-end in collision mode: batch targets finite,
    frame_step trains + renders, loss stays finite."""
    from neuralradiancecaching_tpu.models import nrc
    from neuralradiancecaching_tpu.render import frame, targets

    cfg = _coll_config(use_nn=True)
    cfg = dataclasses.replace(
        cfg, camera=dataclasses.replace(cfg.camera,
                                        position=(0.0, 0.0, -12.0)))
    scene = tiny_scene(cfg)
    batch = targets.generate_train_batch(scene, cfg, jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(batch.target)).all()
    assert np.isfinite(np.asarray(batch.pos)).all()
    inside = np.abs(np.asarray(batch.pos)) <= (
        np.asarray(cfg.volume.box_size) * 0.5 + 1e-3)
    assert inside.all()
    assert float(np.abs(np.asarray(batch.target)).max()) > 0.0

    state = nrc.init_state(jax.random.PRNGKey(1), cfg)
    state, out = frame.frame_step(state, scene, jax.random.PRNGKey(2), cfg)
    assert out.image.shape == (8, 8, 3)
    assert np.isfinite(np.asarray(out.image)).all()
    assert np.isfinite(float(out.mse))


def test_deferred_shade_matches_inband():
    """Banded render with frame-global deferred event shading == the same
    render with in-band dense shading (field light modes are deterministic,
    so moving the shade out of the bands must be exact up to summation
    order)."""
    from neuralradiancecaching_tpu.models import nrc
    from neuralradiancecaching_tpu.render.tiled import render_banded

    cfg = _coll_config(use_nn=True)
    cfg = dataclasses.replace(
        cfg,
        camera=dataclasses.replace(cfg.camera, position=(0.0, 0.0, -12.0)),
        env_map=dataclasses.replace(cfg.env_map, in_scatter_mode="field"))
    scene = tiny_scene(cfg)
    state = nrc.init_state(jax.random.PRNGKey(0), cfg)
    k = jax.random.PRNGKey(5)
    assert pathtrace.shade_deferred(cfg)
    a = np.asarray(render_banded(state, scene, k, cfg, band_rows=4))
    cfg_inband = dataclasses.replace(
        cfg, path=dataclasses.replace(cfg.path, defer_shade=False))
    assert not pathtrace.shade_deferred(cfg_inband)
    b = np.asarray(render_banded(state, scene, k, cfg_inband, band_rows=4))
    assert np.isfinite(a).all()
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_march_split_shapes_and_weights_sane():
    """The split march (coll_phase1_steps) must keep query weights valid
    and events inside the box (RNG differs from the unsplit march, so the
    check is structural, not bitwise)."""
    cfg = _coll_config(use_nn=True)
    cfg = dataclasses.replace(
        cfg,
        camera=dataclasses.replace(cfg.camera, position=(0.0, 0.0, -12.0)),
        path=dataclasses.replace(cfg.path, sampler="collision",
                                 coll_phase1_steps=2,
                                 coll_live_fraction=0.5))
    scene = tiny_scene(cfg, density_value=2.0)
    ro, rd = pixel_rays(scene.camera, 8, 8)
    res, ev = pathtrace.trace_path_collision(
        scene, cfg, ro, rd, jax.random.PRNGKey(1), use_nn=True,
        collect_events=True)
    # r5 collect-mode split: phase-2 slots shade in-band (their sums ride
    # res.scattered), so the event stack carries only the p1 phase-1 slots
    assert ev.shape == (64, cfg.path.coll_phase1_steps, 7)
    assert np.isfinite(np.asarray(res.scattered)).all()
    w = np.asarray(ev[..., 6])
    assert (w >= 0).all() and w.max() <= 1.0 + 1e-5 and w.max() > 0
    pos = np.asarray(ev[..., 0:3])
    inside = np.abs(pos) <= (np.asarray(cfg.volume.box_size) * 0.5 + 1e-3)
    assert inside[w > 0].all()
    qw = np.asarray(res.query_weight)
    assert (qw >= 0).all() and qw.max() <= 1.0 + 1e-5


def test_live_pack_matches_unpacked():
    """Packed-live-ray banded render == the unpacked banded render when the
    pack cap covers every live ray (non-live rays are analytically exact:
    T0=1, pure env; the band RNG keying differs, so use a camera/scene
    where every live band outcome is identical... instead compare against
    the packed path with cap 1.0, which marches ALL rays in packed order
    == original order when everything is live)."""
    from neuralradiancecaching_tpu.models import nrc
    from neuralradiancecaching_tpu.render.tiled import render_banded

    cfg = _coll_config(use_nn=True)
    cfg = dataclasses.replace(
        cfg,
        camera=dataclasses.replace(cfg.camera, position=(0.0, 0.0, -12.0)),
        env_map=dataclasses.replace(cfg.env_map, in_scatter_mode="field"))
    scene = tiny_scene(cfg)
    state = nrc.init_state(jax.random.PRNGKey(0), cfg)
    k = jax.random.PRNGKey(5)

    # dense box, centered camera: every ray through the box is live; with
    # cap 1.0 the packed order == pixel order for live rays, and the band
    # split (4 rows) matches the unpacked program's bands 1:1 only when
    # ALL rays are live -- so compare full-frame (band_rows = height).
    cfg_packed = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, live_pack_fraction=1.0))
    a = np.asarray(render_banded(state, scene, k, cfg, band_rows=8))
    b = np.asarray(render_banded(state, scene, k, cfg_packed, band_rows=8))
    assert np.isfinite(b).all()
    # live rays must agree where the pack preserved pixel order (all-live
    # frame => identity packing => identical RNG streams)
    from neuralradiancecaching_tpu.ops import volume as vol_ops
    from neuralradiancecaching_tpu.ops import lightfield
    ro, rd = pixel_rays(scene.camera, 8, 8)
    entry, _, hit = vol_ops.entry_exit_points(ro, rd, cfg.volume.box_size,
                                              cfg.volume.box_center)
    tau0 = lightfield.query_tau_field(scene.env_t_field, entry, rd,
                                      cfg.volume)
    live = np.asarray(hit & (tau0 > 1e-4)).reshape(8, 8)
    if live.all():
        np.testing.assert_allclose(a, b, atol=1e-5)
    else:
        # identity packing only holds for the live prefix; at minimum the
        # packed render must be finite and match on non-live rays (pure
        # env there in both)
        np.testing.assert_allclose(a[~live], b[~live], atol=1e-5)


def test_live_pack_spp_matches_unpacked_spp():
    """In-program spp>1 through the PACKED pipeline == the unpacked spp
    expansion. With band_rows=1 the band key folds coincide (unpacked
    folds y0 = band_index * band_rows, packed folds the virtual band id;
    both enumerate copy-major), so an all-live frame with pack cap 1.0 is
    identity packing with identical RNG streams -- outputs must agree to
    float-reassociation tolerance (the packed finish averages the copies
    BEFORE the scatter-back; both finishes are linear in rgb/trans)."""
    from neuralradiancecaching_tpu.models import nrc
    from neuralradiancecaching_tpu.render.tiled import render_banded

    cfg = _coll_config(use_nn=True, spp=2)
    cfg = dataclasses.replace(
        cfg,
        camera=dataclasses.replace(cfg.camera, position=(0.0, 0.0, -12.0)),
        env_map=dataclasses.replace(cfg.env_map, in_scatter_mode="field"))
    scene = tiny_scene(cfg)
    state = nrc.init_state(jax.random.PRNGKey(0), cfg)
    k = jax.random.PRNGKey(5)

    cfg_packed = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, live_pack_fraction=1.0))
    a = np.asarray(render_banded(state, scene, k, cfg, band_rows=1))
    b = np.asarray(render_banded(state, scene, k, cfg_packed, band_rows=1))
    assert np.isfinite(b).all()

    from neuralradiancecaching_tpu.ops import lightfield
    ro, rd = pixel_rays(scene.camera, 8, 8)
    entry, _, hit = vol_ops.entry_exit_points(ro, rd, cfg.volume.box_size,
                                              cfg.volume.box_center)
    tau0 = lightfield.query_tau_field(scene.env_t_field, entry, rd,
                                      cfg.volume)
    live = np.asarray(hit & (tau0 > 1e-4)).reshape(8, 8)
    # rtol covers tree-order reassociation of the segmented-scan shade
    # reduction (prefix_segment_sum): the packed/unpacked paths scan at
    # different cap widths, so large radiance values land ~1e-6 rel apart
    if live.all():
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    else:
        np.testing.assert_allclose(a[~live], b[~live], rtol=1e-5, atol=1e-5)


def test_live_pack_hoisted_matches_inprogram():
    """render_banded(pack=frame_live_pack(...)) == pack=None: the pack is
    deterministic per camera pose, so hoisting it out of the per-frame
    program (the ~38 ms full-frame compact_select + ray gathers,
    docs/PERFORMANCE.md) must be bitwise-neutral."""
    from neuralradiancecaching_tpu.models import nrc
    from neuralradiancecaching_tpu.render.tiled import (frame_live_pack,
                                                        render_banded)

    cfg = _coll_config(use_nn=True)
    cfg = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, live_pack_fraction=0.5))
    scene = tiny_scene(cfg)
    state = nrc.init_state(jax.random.PRNGKey(0), cfg)
    k = jax.random.PRNGKey(5)

    a = np.asarray(render_banded(state, scene, k, cfg, band_rows=2))
    pack = frame_live_pack(scene, cfg, 2)
    b = np.asarray(render_banded(state, scene, k, cfg, band_rows=2,
                                 pack=pack))
    np.testing.assert_array_equal(a, b)


def test_delta_sampler_matches_collision_mean():
    """sampler='delta' (true Woodcock null-collision tracking, unbiased) vs
    sampler='collision' (baked inverse-CDF field): same scene, same
    estimator contract, means agree within MC tolerance -- the fixed-seed
    field-vs-ground-truth bias check (VERDICT r2 item 8). The production
    bias number on the real cloud is in docs/PERFORMANCE.md."""
    import dataclasses

    import jax
    import numpy as np

    from neuralradiancecaching_tpu.models import nrc
    from neuralradiancecaching_tpu.render import pathtrace
    from neuralradiancecaching_tpu.scene.camera import pixel_rays
    from tests.test_render_nrc import tiny_config, tiny_scene

    base = tiny_config(use_nn=False)
    base = dataclasses.replace(
        base,
        env_map=dataclasses.replace(base.env_map, in_scatter_mode="field"),
        volume=dataclasses.replace(base.volume, field_shape=(4, 4, 4)),
        camera=dataclasses.replace(base.camera, position=(0.0, 0.0, -12.0)))

    def render_mean(sampler, spp):
        cfg = dataclasses.replace(
            base, path=dataclasses.replace(
                base.path, sampler=sampler, collision_field_steps=16,
                delta_null_steps=32, max_bounces=8))
        scene = tiny_scene(cfg)
        ro, rd = pixel_rays(scene.camera, 16, 16)
        acc = 0.0
        for i in range(spp):
            rgb, _ = pathtrace.render_image(scene, cfg, ro, rd,
                                            jax.random.PRNGKey(100 + i))
            acc = acc + np.asarray(rgb)
        assert np.isfinite(acc).all()
        return acc / spp

    img_c = render_mean("collision", 16)
    img_d = render_mean("delta", 16)
    rel = abs(img_c.mean() - img_d.mean()) / max(img_d.mean(), 1e-6)
    # the two estimators differ only by the baked field's discretization
    # bias + MC noise at 16 spp
    assert rel < 0.1, (img_c.mean(), img_d.mean())


def test_delta_sampler_nn_mode_cut_queries():
    """sampler='delta' in NN mode: RR cuts record cache queries with
    positive weights at in-box positions; the render composes finite."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from neuralradiancecaching_tpu.models import nrc
    from neuralradiancecaching_tpu.render import pathtrace
    from neuralradiancecaching_tpu.scene.camera import pixel_rays
    from tests.test_render_nrc import tiny_config, tiny_scene

    cfg = tiny_config(use_nn=True)
    cfg = dataclasses.replace(
        cfg,
        path=dataclasses.replace(cfg.path, sampler="delta",
                                 delta_null_steps=32, max_bounces=8),
        env_map=dataclasses.replace(cfg.env_map, in_scatter_mode="field"),
        volume=dataclasses.replace(cfg.volume, field_shape=(4, 4, 4)),
        camera=dataclasses.replace(cfg.camera, position=(0.0, 0.0, -10.0)))
    scene = tiny_scene(cfg, density_value=0.8)
    ro, rd = pixel_rays(scene.camera, 16, 16)
    res = pathtrace.trace_path(scene, cfg, ro, rd, jax.random.PRNGKey(2),
                               use_nn=True)
    qfrac = float(np.asarray((res.query_weight > 0).mean()))
    assert qfrac > 0.05, qfrac  # dense medium: many walks reach an RR cut
    qp = np.asarray(res.query_pos)[np.asarray(res.query_weight) > 0]
    half = np.asarray(cfg.volume.box_size) / 2
    assert (np.abs(qp) <= half + 1e-3).all()
    # binary primary see-through: trans in {0, 1}
    tr = np.asarray(res.transmittance)
    assert np.isin(tr, [0.0, 1.0]).all()

    state = nrc.init_state(jax.random.PRNGKey(0), cfg)
    rgb, _ = pathtrace.render_image(
        scene, cfg, ro, rd, jax.random.PRNGKey(3),
        query_fn=lambda p, d: nrc.query(state, p, d, cfg))
    assert np.isfinite(np.asarray(rgb)).all()


def test_delta_batched_matches_sequential_woodcock():
    """The batched delta sampler (cumsum candidates + one gather +
    first-acceptance argmax, render/pathtrace.py) is estimator-IDENTICAL
    to the textbook sequential Woodcock walk: same uniforms, same
    (found, t) per ray. Validated here against an explicit sequential
    reimplementation on a random density grid."""
    key = jax.random.PRNGKey(7)
    grid = jax.random.uniform(key, (12, 9, 14), minval=0.0, maxval=1.0)
    vol = VolumeConfig(grid_shape=(12, 9, 14), box_size=(6.0, 4.5, 7.0),
                       density_factor=0.7)
    table = vol_ops.build_corner_table(grid)
    n, k_cand = 64, 24
    kp, kd, ku = jax.random.split(jax.random.PRNGKey(3), 3)
    pos = (jax.random.uniform(kp, (n, 3)) - 0.5) \
        * (jnp.asarray(vol.box_size) * 0.9)
    d = jax.random.normal(kd, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    u = jax.random.uniform(ku, (k_cand, 2, n))
    sigma = vol.density_factor * jnp.max(grid) + 1e-8
    _, t_far, _ = vol_ops.ray_aabb(pos, d, vol.box_size, vol.box_center)

    # sequential reference walk (the pre-batching implementation)
    t_c = jnp.zeros((n,))
    found_s = jnp.zeros((n,), bool)
    for i in range(k_cand):
        t2 = t_c - jnp.log1p(-u[i, 0]) / sigma
        dens = vol_ops.density_at(table, pos + t2[:, None] * d, vol)
        hit_i = ~found_s & (t2 <= t_far) & (u[i, 1] * sigma < dens)
        t_c = jnp.where(found_s, t_c, t2)
        found_s = found_s | hit_i

    # batched formulation (as shipped)
    t_cand = jnp.cumsum(-jnp.log1p(-u[:, 0]), axis=0) / sigma
    xc = pos[None] + jnp.minimum(t_cand, t_far[None])[..., None] * d[None]
    dens = vol_ops.density_at(table, xc.reshape(-1, 3), vol
                              ).reshape(k_cand, n)
    acc = (t_cand <= t_far[None]) & (u[:, 1] * sigma < dens)
    found_b = jnp.any(acc, axis=0)
    t_b = jnp.take_along_axis(t_cand, jnp.argmax(acc, axis=0)[None],
                              axis=0)[0]

    np.testing.assert_array_equal(np.asarray(found_s), np.asarray(found_b))
    f = np.asarray(found_s)
    assert f.any()
    # only float-association differs (sequential adds vs cumsum-then-divide)
    np.testing.assert_allclose(np.asarray(t_c)[f], np.asarray(t_b)[f],
                               rtol=1e-5)


def test_majorant_grid_bounds_trilinear_density():
    """ops/volume.majorant_grid contract: maj[cell(q)] >= density(p) for
    every p within one coarse cell edge of q (the slack the batched
    local-majorant sampler's midpoint sampling relies on)."""
    key = jax.random.PRNGKey(11)
    grid = jax.random.uniform(key, (25, 17, 31), minval=0.0, maxval=2.0)
    vol = VolumeConfig(grid_shape=(25, 17, 31), box_size=(12.5, 8.5, 15.5),
                       density_factor=1.0)
    cells = (5, 4, 6)
    maj = vol_ops.majorant_grid(grid, cells)
    vox = [b / g for b, g in zip(vol.box_size, vol.grid_shape)]
    fpc = [-(-g // c) for g, c in zip(vol.grid_shape, cells)]
    cell_sz = np.asarray([v * f for v, f in zip(vox, fpc)], np.float32)
    min_edge = float(cell_sz.min())
    half = np.asarray(vol.box_size, np.float32) / 2

    kq, ko = jax.random.split(jax.random.PRNGKey(4))
    q = (jax.random.uniform(kq, (4096, 3)) - 0.5) \
        * jnp.asarray(vol.box_size)
    off = (jax.random.uniform(ko, (4096, 3)) * 2.0 - 1.0) * min_edge
    p = jnp.clip(q + off, -half, half)  # density is 0 outside anyway
    dens = np.asarray(vol_ops.density_at(grid, p, vol))
    idx = np.clip(((np.asarray(q) + half) / cell_sz).astype(np.int32),
                  0, np.asarray(cells) - 1)
    bound = np.asarray(maj)[idx[:, 0], idx[:, 1], idx[:, 2]]
    assert (dens <= bound + 1e-5).all(), float((dens - bound).max())


def test_delta_local_majorant_matches_global():
    """delta_majorant='local' is the same unbiased estimator with a
    tighter per-event bound: mean radiance matches the global-majorant
    delta render within MC tolerance, at a quarter of the candidate
    budget."""
    base = tiny_config(use_nn=False)
    base = dataclasses.replace(
        base,
        env_map=dataclasses.replace(base.env_map, in_scatter_mode="field"),
        volume=dataclasses.replace(base.volume, field_shape=(4, 4, 4)),
        camera=dataclasses.replace(base.camera, position=(0.0, 0.0, -12.0)))

    def render_mean(majorant, n_cand, spp):
        cfg = dataclasses.replace(
            base, path=dataclasses.replace(
                base.path, sampler="delta", delta_null_steps=n_cand,
                delta_majorant=majorant, delta_majorant_cells=(4, 4, 4),
                delta_majorant_samples=8, max_bounces=8))
        scene = tiny_scene(cfg)
        ro, rd = pixel_rays(scene.camera, 16, 16)
        acc = 0.0
        for i in range(spp):
            rgb, _ = pathtrace.render_image(scene, cfg, ro, rd,
                                            jax.random.PRNGKey(200 + i))
            acc = acc + np.asarray(rgb)
        assert np.isfinite(acc).all()
        return acc / spp

    img_g = render_mean("global", 32, 12)
    img_l = render_mean("local", 8, 12)
    rel = abs(img_g.mean() - img_l.mean()) / max(img_g.mean(), 1e-6)
    assert rel < 0.08, (img_g.mean(), img_l.mean())


def test_delta_local_majorant_coverage_validation():
    """Too few midpoint samples to cover the box diagonal at one
    cell-edge spacing must be rejected at trace time, not silently
    biased."""
    import pytest

    cfg = tiny_config(use_nn=False)
    cfg = dataclasses.replace(
        cfg, path=dataclasses.replace(
            cfg.path, sampler="delta", delta_majorant="local",
            delta_majorant_cells=(16, 16, 16), delta_majorant_samples=2))
    scene = tiny_scene(cfg)
    ro, rd = pixel_rays(scene.camera, 4, 4)
    with pytest.raises(ValueError, match="cover the box diagonal"):
        pathtrace.render_image(scene, cfg, ro, rd, jax.random.PRNGKey(0))


def test_delta_ratio_fully_unbiased_pipeline():
    """sampler='delta' + transmittance_mode='ratio' (path AND env) is the
    fully-unbiased ground-truth configuration: renders finite and its mean
    agrees with the same sampler under the reference's quadrature
    transmittance within MC tolerance."""
    base = tiny_config(use_nn=False)
    base = dataclasses.replace(
        base, camera=dataclasses.replace(base.camera,
                                         position=(0.0, 0.0, -12.0)))

    def render_mean(path_tm, env_tm, spp):
        cfg = dataclasses.replace(
            base,
            path=dataclasses.replace(
                base.path, sampler="delta", delta_null_steps=32,
                max_bounces=8, transmittance_mode=path_tm,
                ratio_tracking_steps=32),
            env_map=dataclasses.replace(base.env_map, n_samples=2,
                                        transmittance_mode=env_tm))
        scene = tiny_scene(cfg)
        ro, rd = pixel_rays(scene.camera, 16, 16)
        acc = 0.0
        for i in range(spp):
            rgb, _ = pathtrace.render_image(scene, cfg, ro, rd,
                                            jax.random.PRNGKey(300 + i))
            acc = acc + np.asarray(rgb)
        assert np.isfinite(acc).all()
        return acc / spp

    img_q = render_mean("quadrature", "quadrature", 12)
    img_r = render_mean("ratio", "ratio", 12)
    rel = abs(img_q.mean() - img_r.mean()) / max(img_q.mean(), 1e-6)
    assert rel < 0.08, (img_q.mean(), img_r.mean())


def test_delta_train_batch_and_step():
    """sampler='delta' now routes train-batch generation through the same
    RR-cut machinery as 'collision' (unbiased binary-branch walks for both
    vertex selection and targets): finite targets, in-box vertices, and a
    finite train step."""
    from neuralradiancecaching_tpu.models import nrc
    from neuralradiancecaching_tpu.render import targets

    cfg = tiny_config(use_nn=True)
    cfg = dataclasses.replace(
        cfg,
        path=dataclasses.replace(cfg.path, sampler="delta",
                                 delta_null_steps=16, max_bounces=8),
        camera=dataclasses.replace(cfg.camera, position=(0.0, 0.0, -10.0)))
    scene = tiny_scene(cfg, density_value=0.8)
    batch = targets.generate_train_batch(scene, cfg, jax.random.PRNGKey(4))
    assert np.isfinite(np.asarray(batch.target)).all()
    half = np.asarray(cfg.volume.box_size) / 2
    assert (np.abs(np.asarray(batch.pos)) <= half + 1e-3).all()

    state = nrc.init_state(jax.random.PRNGKey(0), cfg)
    state2, mse = nrc.train_step(state, batch.pos, batch.dir, batch.target,
                                 cfg)
    assert np.isfinite(float(mse))


def test_delta_with_march_split():
    """The delta branch is lane-count agnostic: enabling the march split
    (live lanes compacted to a fraction mid-walk) renders finite with the
    same mean as the unsplit walk."""
    base = tiny_config(use_nn=False)
    base = dataclasses.replace(
        base, camera=dataclasses.replace(base.camera,
                                         position=(0.0, 0.0, -12.0)))

    def render_mean(p1, frac, spp):
        cfg = dataclasses.replace(
            base, path=dataclasses.replace(
                base.path, sampler="delta", delta_null_steps=16,
                max_bounces=8, coll_weight_rr=1e-4,
                coll_nonn_phase1_steps=p1, coll_nonn_live_fraction=frac))
        scene = tiny_scene(cfg)
        # 48x48 = 2304 rays > the 1024-lane compaction floor, so the split
        # REALLY shrinks the lane count mid-walk (1152 lanes)
        ro, rd = pixel_rays(scene.camera, 48, 48)
        acc = 0.0
        for i in range(spp):
            rgb, _ = pathtrace.render_image(scene, cfg, ro, rd,
                                            jax.random.PRNGKey(400 + i))
            acc = acc + np.asarray(rgb)
        assert np.isfinite(acc).all()
        return acc / spp

    img_plain = render_mean(0, 0.0, 4)
    img_split = render_mean(3, 0.5, 4)
    rel = abs(img_plain.mean() - img_split.mean()) / max(img_plain.mean(),
                                                         1e-6)
    assert rel < 0.1, (img_plain.mean(), img_split.mean())


def test_delta_deferred_matches_inband():
    """Delta sampler through the production deferred pipeline (banded
    march, frame-global shade/query finish): equals the in-band shaded
    render -- the deferral is exact for delta too (prefix-shaped events,
    randomness-free field shading)."""
    from neuralradiancecaching_tpu.models import nrc
    from neuralradiancecaching_tpu.render import tiled

    cfg = tiny_config(use_nn=True)
    cfg = dataclasses.replace(
        cfg,
        path=dataclasses.replace(cfg.path, sampler="delta",
                                 delta_null_steps=16, max_bounces=8),
        env_map=dataclasses.replace(cfg.env_map, in_scatter_mode="field",
                                    transmittance_mode="field"),
        volume=dataclasses.replace(cfg.volume, field_shape=(4, 4, 4)),
        render=dataclasses.replace(cfg.render, width=16, height=16),
        camera=dataclasses.replace(cfg.camera, position=(0.0, 0.0, -12.0)))
    assert pathtrace.shade_deferred(cfg)
    scene = tiny_scene(cfg)
    state = nrc.init_state(jax.random.PRNGKey(0), cfg)
    img_banded = tiled.render_banded(state, scene, jax.random.PRNGKey(5),
                                     cfg, band_rows=4)
    cfg_in = dataclasses.replace(
        cfg, path=dataclasses.replace(cfg.path, defer_shade=False))
    assert not pathtrace.shade_deferred(cfg_in)
    img_in = tiled.render_banded(state, scene, jax.random.PRNGKey(5),
                                 cfg_in, band_rows=4)
    assert np.isfinite(np.asarray(img_banded)).all()
    np.testing.assert_allclose(np.asarray(img_banded), np.asarray(img_in),
                               rtol=3e-4, atol=3e-4)


def test_uncapped_query_chunked_matches_single_call():
    """query_cap_fraction=1.0 with n > query_chunk routes the full-width
    query through padded lax.map chunks (the compile helper rejects
    full-frame single-call encodes); it must equal the one-call path
    exactly (same rows, same query_fn, only the call batching differs)."""
    from neuralradiancecaching_tpu.models import nrc
    from neuralradiancecaching_tpu.render.tiled import render_banded

    cfg = _coll_config(use_nn=True)
    cfg = dataclasses.replace(
        cfg,
        camera=dataclasses.replace(cfg.camera, position=(0.0, 0.0, -12.0)),
        env_map=dataclasses.replace(cfg.env_map, in_scatter_mode="field"),
        render=dataclasses.replace(cfg.render, query_cap_fraction=1.0))
    scene = tiny_scene(cfg)
    state = nrc.init_state(jax.random.PRNGKey(0), cfg)
    k = jax.random.PRNGKey(5)
    assert pathtrace.shade_deferred(cfg)
    n = cfg.render.width * cfg.render.height
    # one-call path (chunk >= n) vs chunked path (chunk < n, non-dividing
    # so the padding branch is exercised)
    a = np.asarray(render_banded(state, scene, k, cfg, band_rows=4))
    cfg_chunked = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, query_chunk=24))
    assert cfg_chunked.render.query_chunk < n
    b = np.asarray(render_banded(state, scene, k, cfg_chunked, band_rows=4))
    np.testing.assert_array_equal(a, b)


def test_frame_entry_tau_matches_independent_slab_quadrature():
    """frame_entry_tau (r4 exact-entry-tau hoist): per pixel ray, tau
    equals -log T of the entry->exit segment where entry/exit come from
    an INDEPENDENT numpy slab test (validating entry_exit_points + the
    hoist wiring), misses are exactly zero, and the deepest ray's tau is
    near the analytic factor * density * chord (border trilerp thins the
    face half-voxels, hence the loose tolerance there)."""
    from neuralradiancecaching_tpu.render import tiled

    cfg = _coll_config(use_nn=False)
    cfg = dataclasses.replace(
        cfg, camera=dataclasses.replace(cfg.camera,
                                        position=(0.0, 0.0, -12.0)))
    assert cfg.path.entry_tau_steps > 0  # the shipped default
    scene = tiny_scene(cfg, density_value=0.5)
    tau = np.asarray(tiled.frame_entry_tau(scene, cfg))

    ro, rd = pixel_rays(scene.camera, cfg.render.width, cfg.render.height)
    ro_n, rd_n = np.asarray(ro), np.asarray(rd)
    half = np.asarray(cfg.volume.box_size, np.float32) / 2.0
    with np.errstate(divide="ignore"):
        t1 = (-half - ro_n) / rd_n
        t2 = (half - ro_n) / rd_n
    t_near = np.maximum(np.minimum(t1, t2).max(axis=1), 0.0)
    t_far = np.maximum(t1, t2).min(axis=1)
    hits = t_far > t_near
    entry = ro_n + t_near[:, None] * rd_n
    exit_p = ro_n + t_far[:, None] * rd_n
    t_seg = np.asarray(vol_ops.transmittance(
        scene.density, jnp.asarray(entry), jnp.asarray(exit_p),
        cfg.path.entry_tau_steps, cfg.volume))
    expect = np.where(hits, -np.log(np.maximum(t_seg, 1e-20)), 0.0)
    np.testing.assert_allclose(tau, expect, rtol=1e-4, atol=1e-5)
    assert hits.any() and not hits.all()
    # deepest chord: quadrature tau within 15% of the analytic constant-
    # density value (the face half-voxel border lerp accounts for the gap)
    i = int(np.argmax(np.where(hits, t_far - t_near, 0.0)))
    chord = float(np.linalg.norm(exit_p[i] - entry[i]))
    analytic = cfg.volume.density_factor * 0.5 * chord
    assert abs(tau[i] - analytic) / analytic < 0.15, (tau[i], analytic)


def test_frame_entry_tau_zero_when_disabled():
    """entry_tau_steps=0 (the train-walk setting, targets._train_walk_cfg)
    keeps the row tau: the hoisted bake returns exact zeros."""
    from neuralradiancecaching_tpu.render import tiled

    cfg = _coll_config(use_nn=False)
    cfg = dataclasses.replace(
        cfg, path=dataclasses.replace(cfg.path, entry_tau_steps=0))
    scene = tiny_scene(cfg)
    assert np.abs(np.asarray(tiled.frame_entry_tau(scene, cfg))).max() == 0.0


def test_collision_nonn_two_phase_split_parity():
    """The no-NN two-phase walk split (r4 train lever,
    PathTraceConfig.coll_nonn_phase1_steps / coll_nonn_live_fraction) on
    the COLLISION sampler: phase-2 shades at the packed lanes and
    scatter-adds back, so the render mean must match the unsplit walk."""
    base = _coll_config(use_nn=False)
    base = dataclasses.replace(
        base, camera=dataclasses.replace(base.camera,
                                         position=(0.0, 0.0, -12.0)))

    def render_mean(p1, frac, spp):
        cfg = dataclasses.replace(
            base, path=dataclasses.replace(
                base.path, max_bounces=8, coll_weight_rr=1e-4,
                coll_nonn_phase1_steps=p1, coll_nonn_live_fraction=frac))
        scene = tiny_scene(cfg)
        # 48x48 = 2304 rays > the 1024-lane compaction floor, so the
        # split REALLY shrinks the lane count mid-walk
        ro, rd = pixel_rays(scene.camera, 48, 48)
        acc = 0.0
        for i in range(spp):
            rgb, _ = pathtrace.render_image(scene, cfg, ro, rd,
                                            jax.random.PRNGKey(500 + i))
            acc = acc + np.asarray(rgb)
        assert np.isfinite(acc).all()
        return acc / spp

    img_plain = render_mean(0, 0.0, 4)
    img_split = render_mean(3, 0.5, 4)
    rel = abs(img_plain.mean() - img_split.mean()) / max(img_plain.mean(),
                                                         1e-6)
    assert rel < 0.1, (img_plain.mean(), img_split.mean())


def _nonn_render_mean(base, spp, **path_over):
    cfg = dataclasses.replace(
        base, path=dataclasses.replace(
            base.path, max_bounces=12, coll_weight_rr=1e-4, **path_over))
    scene = tiny_scene(cfg)
    ro, rd = pixel_rays(scene.camera, 48, 48)
    acc = 0.0
    for i in range(spp):
        rgb, _ = pathtrace.render_image(scene, cfg, ro, rd,
                                        jax.random.PRNGKey(500 + i))
        acc = acc + np.asarray(rgb)
    assert np.isfinite(acc).all()
    return acc / spp


def test_collision_nonn_cascade_split_parity():
    """The r5 CASCADE split (coll_nonn_phase2_steps: a second repack p2a
    slots into phase 2, tail slots at live2_fraction * n lanes, shaded
    prefix-packed per phase) must match the unsplit walk's render mean --
    same estimator, different RNG streams, so the gate is statistical
    like the two-phase parity test above."""
    base = _coll_config(use_nn=False)
    base = dataclasses.replace(
        base, camera=dataclasses.replace(base.camera,
                                         position=(0.0, 0.0, -12.0)))
    img_plain = _nonn_render_mean(base, 4)
    img_casc = _nonn_render_mean(base, 4, coll_nonn_phase1_steps=3,
                                 coll_nonn_live_fraction=0.5,
                                 coll_nonn_phase2_steps=3,
                                 coll_nonn_live2_fraction=0.5)
    rel = abs(img_plain.mean() - img_casc.mean()) / max(img_plain.mean(),
                                                        1e-6)
    assert rel < 0.1, (img_plain.mean(), img_casc.mean())


def test_collision_shade_bf16_stacks_parity():
    """coll_shade_bf16 writes the prefix-shade event stacks bf16 (upcast
    after the pack's gather): same uniforms, same walk -- only the event
    rows are quantized, so the render mean must track the f32 stacks to
    bf16 rounding scale."""
    base = _coll_config(use_nn=False)
    base = dataclasses.replace(
        base, camera=dataclasses.replace(base.camera,
                                         position=(0.0, 0.0, -12.0)))
    img_f32 = _nonn_render_mean(base, 2)
    img_bf16 = _nonn_render_mean(base, 2, coll_shade_bf16=True)
    rel = abs(img_f32.mean() - img_bf16.mean()) / max(img_f32.mean(), 1e-6)
    assert rel < 0.02, (img_f32.mean(), img_bf16.mean())


def test_train_walk_cfg_maps_cascade_fields():
    """targets._train_walk_cfg must scope the aggressive train-walk levers
    (p1=4, cascade, bf16 stacks) to the TRAIN walk config only."""
    from neuralradiancecaching_tpu.render.targets import _train_walk_cfg
    cfg = _coll_config(use_nn=False)
    tcfg = _train_walk_cfg(cfg)
    assert tcfg.path.coll_nonn_phase1_steps == cfg.path.coll_target_phase1_steps
    assert tcfg.path.coll_nonn_phase2_steps == cfg.path.coll_target_phase2_steps
    assert tcfg.path.coll_shade_bf16 == cfg.path.coll_target_shade_bf16
    assert tcfg.path.coll_shade_cap_p1 == cfg.path.coll_target_shade_cap_p1
    assert tcfg.path.entry_tau_steps == 0
    # the render-side config itself is untouched
    assert cfg.path.coll_nonn_phase2_steps == 0
    assert cfg.path.coll_shade_bf16 is False
    assert cfg.path.coll_shade_cap_p1 == 0.0


def test_collision_collect_split_banded_parity():
    """The r5 collect-mode march split (banded packed render: phase-2
    slots shade in-band at the m1 packed lanes, only phase-1 slots reach
    the deferred finish) must match the unsplit banded render's mean --
    same estimator, different RNG streams."""
    import numpy as np

    from neuralradiancecaching_tpu.models import nrc
    from neuralradiancecaching_tpu.render import frame as frame_mod
    from neuralradiancecaching_tpu.render import tiled

    base = _coll_config(use_nn=True)
    base = dataclasses.replace(
        base, camera=dataclasses.replace(base.camera,
                                         position=(0.0, 0.0, -12.0)))

    def render_mean(p1, frac, spp):
        cfg = dataclasses.replace(
            base,
            path=dataclasses.replace(base.path, coll_phase1_steps=p1,
                                     coll_live_fraction=frac),
            render=dataclasses.replace(base.render, width=64, height=64,
                                       live_pack_fraction=1.0,
                                       query_cap_fraction=1.0))
        scene = tiny_scene(cfg)
        st = nrc.init_state(jax.random.PRNGKey(0), cfg)
        for i in range(3):
            st, _ = frame_mod.train_only_step(st, scene,
                                              jax.random.PRNGKey(i), cfg)
        acc = 0.0
        for i in range(spp):
            img = np.asarray(tiled.render_banded(
                st, scene, jax.random.PRNGKey(100 + i), cfg, band_rows=16))
            acc = acc + img
        assert np.isfinite(acc).all()
        return acc / spp

    img_off = render_mean(0, 0.0, 3)
    img_split = render_mean(2, 0.5, 3)
    rel = abs(img_off.mean() - img_split.mean()) / max(img_off.mean(), 1e-6)
    assert rel < 0.05, (img_off.mean(), img_split.mean())


def test_live_tau_threshold_drops_to_env():
    """RenderConfig.live_tau_threshold: a huge threshold drops every lane
    to the analytic pure-env composite; a tiny one reproduces the default
    mask bit-exactly (same pack, same RNG streams, identical image)."""
    from neuralradiancecaching_tpu.models import nrc
    from neuralradiancecaching_tpu.ops import envmap as envmap_ops
    from neuralradiancecaching_tpu.render.tiled import (live_fraction,
                                                        render_banded)

    cfg = _coll_config(use_nn=True)
    cfg = dataclasses.replace(
        cfg,
        camera=dataclasses.replace(cfg.camera, position=(0.0, 0.0, -12.0)),
        env_map=dataclasses.replace(cfg.env_map, in_scatter_mode="field"),
        render=dataclasses.replace(cfg.render, live_pack_fraction=1.0))
    assert pathtrace.shade_deferred(cfg)  # else the pack (and the
    # threshold) is bypassed and this test checks nothing
    scene = tiny_scene(cfg)
    state = nrc.init_state(jax.random.PRNGKey(0), cfg)
    k = jax.random.PRNGKey(5)

    base = np.asarray(render_banded(state, scene, k, cfg, band_rows=8))

    cfg_same = dataclasses.replace(cfg, render=dataclasses.replace(
        cfg.render, live_tau_threshold=1e-4))
    np.testing.assert_array_equal(
        base, np.asarray(render_banded(state, scene, k, cfg_same,
                                       band_rows=8)))

    cfg_all = dataclasses.replace(cfg, render=dataclasses.replace(
        cfg.render, live_tau_threshold=1e6))
    assert live_fraction(scene, cfg_all) == 0.0
    img_all = np.asarray(render_banded(state, scene, k, cfg_all,
                                       band_rows=8))
    _, rd = pixel_rays(scene.camera, 8, 8)
    env = np.asarray(envmap_ops.sample_direct(scene.env, rd,
                                              hpm=False)).reshape(8, 8, 3)
    np.testing.assert_allclose(img_all, env, atol=1e-5)


def test_shade_cap_p1_covering_is_exact():
    """coll_shade_cap_p1: any covering per-lane budget must reproduce the
    inherited-cap targets EXACTLY -- the pack keeps the same prefix order,
    padding rows contribute zero, so only an overflow drop could differ."""
    from neuralradiancecaching_tpu.render import targets as targets_mod

    cfg = _coll_config(use_nn=True)
    cfg = dataclasses.replace(
        cfg,
        camera=dataclasses.replace(cfg.camera, position=(0.0, 0.0, -12.0)))
    scene = tiny_scene(cfg)
    k = jax.random.PRNGKey(3)

    def batch(cap_p1):
        c = dataclasses.replace(cfg, path=dataclasses.replace(
            cfg.path, coll_target_shade_cap_p1=cap_p1))
        return targets_mod.generate_train_batch(scene, c, k)

    a = batch(0.0)          # inherit coll_shade_cap (4.0, dense at p1=4)
    b = batch(2.0)          # covering tighter budget
    np.testing.assert_array_equal(np.asarray(a.target),
                                  np.asarray(b.target))
    assert np.isfinite(np.asarray(a.target)).all()


def test_shade_slot0_dense_matches_packed():
    """RenderConfig.shade_slot0_dense: dense slot-0 + packed-tail shade
    must equal the all-slots packed shade up to fp-sum order (identical
    events, identical estimator)."""
    from neuralradiancecaching_tpu.models import nrc
    from neuralradiancecaching_tpu.render.tiled import render_banded

    cfg = _coll_config(use_nn=True)
    cfg = dataclasses.replace(
        cfg,
        camera=dataclasses.replace(cfg.camera, position=(0.0, 0.0, -12.0)),
        env_map=dataclasses.replace(cfg.env_map, in_scatter_mode="field"),
        render=dataclasses.replace(cfg.render, live_pack_fraction=1.0))
    assert pathtrace.shade_deferred(cfg)
    scene = tiny_scene(cfg)
    state = nrc.init_state(jax.random.PRNGKey(0), cfg)
    k = jax.random.PRNGKey(5)

    a = np.asarray(render_banded(state, scene, k, cfg, band_rows=8))
    cfg_d = dataclasses.replace(cfg, render=dataclasses.replace(
        cfg.render, shade_slot0_dense=True))
    b = np.asarray(render_banded(state, scene, k, cfg_d, band_rows=8))
    assert np.isfinite(b).all()
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)
