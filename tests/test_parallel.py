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


def dp_collision_config():
    """The SHIPPED pipeline flavor (collision sampler + deferred events +
    bf16 fields + field light modes) at mesh-test scale: coarse baked-field
    resolution so the bakes run in seconds on the virtual CPU mesh."""
    cfg = dp_config()
    return dataclasses.replace(
        cfg,
        path=dataclasses.replace(cfg.path, sampler="collision",
                                 collision_field_steps=8),
        env_map=dataclasses.replace(cfg.env_map, in_scatter_mode="field"),
        volume=dataclasses.replace(cfg.volume, field_dtype="bfloat16",
                                   field_shape=(4, 4, 4)),
        render=dataclasses.replace(cfg.render, width=16, height=16,
                                   use_nn=True),
    )


def test_dp_collision_frame_step_end_to_end():
    """The flagship collision pipeline executes under shard_map (VERDICT r2
    item 6): full DP train + render step, finite and replicated."""
    cfg = dp_collision_config()
    scene = tiny_scene(cfg)
    mesh = make_mesh()
    state = nrc.init_state(jax.random.PRNGKey(0), cfg)
    state, img, mse = dp_frame_step(state, scene, jax.random.PRNGKey(1),
                                    cfg, mesh)
    assert img.shape == (16, 16, 3)
    assert np.isfinite(np.asarray(img)).all()
    assert np.isfinite(float(mse))


def test_dp_render_banded_collision_mesh1_vs_mesh8():
    """SURVEY §4 mesh-size parity, render side: the banded DP render keys
    every band by its GLOBAL band id and caps are drop-free at defaults, so
    the image is the same on a 1-device and an 8-device mesh (same seed)."""
    from neuralradiancecaching_tpu.parallel import dp_render_banded

    cfg = dp_collision_config()
    scene = tiny_scene(cfg)
    state = nrc.init_state(jax.random.PRNGKey(0), cfg)
    img1 = dp_render_banded(state, scene, jax.random.PRNGKey(3), cfg,
                            make_mesh(1), band_rows=2)
    img8 = dp_render_banded(state, scene, jax.random.PRNGKey(3), cfg,
                            make_mesh(8), band_rows=2)
    assert np.isfinite(np.asarray(img1)).all()
    np.testing.assert_allclose(np.asarray(img8), np.asarray(img1),
                               rtol=2e-5, atol=2e-5)


def test_dp_render_banded_packed_parity():
    """The DP live-ray-packed render (dp_render_banded_packed) matches the
    single-chip packed path (render_banded(pack=...)) AND is mesh-size
    independent: packed bands are keyed by GLOBAL packed band id and a
    shared pose-static pack fixes the lane order, so mesh(1), mesh(8) and
    the non-DP packed program agree on the same image."""
    from neuralradiancecaching_tpu.parallel import dp_render_banded_packed
    from neuralradiancecaching_tpu.render.tiled import (frame_live_pack,
                                                        render_banded)

    cfg = dp_collision_config()
    cfg = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, live_pack_fraction=0.5))
    scene = tiny_scene(cfg)
    state = nrc.init_state(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(3)

    # band_rows=1 -> 16 one-row bands of 16 lanes; fraction 0.5 -> 8
    # packed bands, exactly one per device on the 8-mesh (real packing,
    # not the identity)
    pack = frame_live_pack(scene, cfg, 1, multiple_of=8)
    img_sc = render_banded(state, scene, key, cfg, band_rows=1, pack=pack)
    img1 = dp_render_banded_packed(state, scene, key, cfg, make_mesh(1),
                                   band_rows=1, pack=pack)
    img8 = dp_render_banded_packed(state, scene, key, cfg, make_mesh(8),
                                   band_rows=1, pack=pack)
    assert np.isfinite(np.asarray(img_sc)).all()
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img_sc),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(img8), np.asarray(img_sc),
                               rtol=2e-5, atol=2e-5)


def test_dp_train_step_mesh8_equals_sharded_single_device():
    """SURVEY §4 mesh-size parity, train side: one dp_train_step on the
    8-device mesh produces the same post-step parameters as a single-device
    emulation of the identical 8-shard key/ray split (grads meaned across
    shards, replicated update) -- the DP step adds sharding, not math."""
    from neuralradiancecaching_tpu.render import targets
    from neuralradiancecaching_tpu.scene.camera import pixel_rays

    cfg = dp_collision_config()
    scene = tiny_scene(cfg)
    state = nrc.init_state(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(7)

    state8, mse8 = dp_train_step(state, scene, key, cfg, make_mesh(8))

    # single-device emulation: the SAME train_ray_pool (built before
    # sharding), the same per-shard key folding
    k_pool, key2 = jax.random.split(key)
    ro, rd = targets.train_ray_pool(scene, cfg, k_pool)
    n = ro.shape[0]
    per = n // 8
    grads_sum = None
    mses = []
    for d in range(8):
        kd = jax.random.fold_in(key2, d)
        sl = slice(d * per, (d + 1) * per)
        batch = targets.generate_train_batch_for_rays(scene, cfg, kd,
                                                      ro[sl], rd[sl],
                                                      expanded=True)
        g, mse = nrc.compute_grads(state, batch.pos, batch.dir,
                                   batch.target, cfg)
        mses.append(float(mse))
        if grads_sum is None:
            grads_sum = g
        else:
            grads_sum = jax.tree_util.tree_map(jnp.add, grads_sum, g)
    grads_mean = jax.tree_util.tree_map(lambda x: x / 8.0, grads_sum)
    state1 = nrc.apply_grads(state, grads_mean, cfg)

    np.testing.assert_allclose(float(mse8), np.mean(mses), rtol=1e-5)
    for name in state1.mlp_params:
        np.testing.assert_allclose(np.asarray(state8.mlp_params[name]),
                                   np.asarray(state1.mlp_params[name]),
                                   rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(state8.hash_table),
                               np.asarray(state1.hash_table),
                               rtol=1e-5, atol=1e-6)


def test_dp_delta_frame_step_end_to_end():
    """The unbiased delta sampler (batched Woodcock, local majorant) also
    executes under shard_map: full DP train + render step, finite and
    replicated -- multi-chip parity runs need no special casing."""
    cfg = dp_collision_config()
    cfg = dataclasses.replace(
        cfg, path=dataclasses.replace(cfg.path, sampler="delta",
                                      delta_null_steps=8,
                                      delta_majorant="local",
                                      delta_majorant_cells=(4, 4, 4),
                                      delta_majorant_samples=8))
    scene = tiny_scene(cfg)
    mesh = make_mesh()
    state = nrc.init_state(jax.random.PRNGKey(0), cfg)
    state, img, mse = dp_frame_step(state, scene, jax.random.PRNGKey(1),
                                    cfg, mesh)
    assert img.shape == (16, 16, 3)
    assert np.isfinite(np.asarray(img)).all()
    assert np.isfinite(float(mse))


def test_probe_dp_caps_tight_and_drop_free():
    """Per-shard cap probing (VERDICT r3 item 6): bench-tight caps sized to
    the WORST shard by probe_dp_caps are provably drop-free on the 8-device
    mesh (identical image to the drop-free defaults), while a cap sized to
    the FRAME MEAN -- what a naive single-chip probe would pick -- visibly
    drops events on the skewed shard. 128x128 frame, band_rows=16 -> one
    band per device (top bands sky, bottom bands cloud => real per-shard
    spread: probed event fractions [0.66, 0.64, 0.06, 0, ...]) at a
    per-device base of 2048 lanes, putting the worst shard's ~1353 events
    above shade_and_query's 1024-lane cap floor so caps actually control
    the compaction."""
    from neuralradiancecaching_tpu.parallel import (dp_render_banded,
                                                    probe_dp_caps)

    cfg = dp_collision_config()
    # push the camera down-left so the volume covers only part of the frame
    cfg = dataclasses.replace(
        cfg,
        camera=dataclasses.replace(cfg.camera, position=(6.0, 9.0, -14.0)),
        render=dataclasses.replace(cfg.render, width=128, height=128))
    scene = tiny_scene(cfg)
    state = nrc.init_state(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(5)
    mesh = make_mesh(8)

    img_free = dp_render_banded(state, scene, key, cfg, mesh, band_rows=16)

    # probe with stride=1 (exact per-shard fractions at this small size)
    cfg_t, rep = probe_dp_caps(scene, cfg, 8, band_rows=16, stride=1)
    assert rep.query_frac.shape == (8,)
    # the scene is genuinely skewed: worst shard needs well above the mean
    assert rep.event_mean.max() > 1.5 * max(rep.event_mean.mean(), 1e-9)
    # probed caps are tighter than the drop-free defaults...
    assert cfg_t.render.shade_cap_fraction < cfg.render.shade_cap_fraction
    # ...yet drop-free per shard: identical image
    img_tight = dp_render_banded(state, scene, key, cfg_t, mesh,
                                 band_rows=16)
    np.testing.assert_allclose(np.asarray(img_tight), np.asarray(img_free),
                               rtol=1e-6, atol=1e-7)

    # the naive frame-mean cap (same margin/rounding, mean instead of max)
    # is NOT shard-safe here: the skewed shard drops events and the image
    # changes -- this is the failure mode per-shard probing exists to stop
    from neuralradiancecaching_tpu.parallel.data_parallel import _round_cap
    mean_cap = min(float(rep.event_mean.max()),
                   _round_cap(float(rep.event_mean.mean()), 1.05, 0.01))
    if mean_cap < rep.event_mean.max():
        cfg_m = dataclasses.replace(
            cfg, render=dataclasses.replace(
                cfg.render, shade_cap_fraction=mean_cap,
                query_cap_fraction=cfg_t.render.query_cap_fraction))
        img_mean = dp_render_banded(state, scene, key, cfg_m, mesh,
                                    band_rows=16)
        assert float(np.abs(np.asarray(img_mean)
                            - np.asarray(img_free)).max()) > 0.0
