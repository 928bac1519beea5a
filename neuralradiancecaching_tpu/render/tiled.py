"""Tiled rendering: split the pixel grid into row bands so arbitrarily large
frames fit in HBM (the per-band transient buffers are O(band_rays *
env_samples), not O(frame)).

Two strategies, same math:

* :func:`render_banded` -- the band loop INSIDE one jitted program
  (``lax.map`` over row bands). This is the reference's single pre-recorded
  command buffer (NrcHpmRenderer.cpp:571-731) at production sizes: one
  dispatch per frame, image stays on device. Transients are bounded exactly
  like the host loop because lax.map runs bands sequentially.
* :func:`render_tiled` -- host-side band loop (one jitted band program
  re-dispatched per band). Kept for environments where a whole-frame
  program cannot be compiled (the remote compile helper used by the axon
  tunnel crashes on very large programs); also what the multi-host DP path
  builds on. Returns a DEVICE array -- callers that want numpy do one
  transfer at the end (the tunnel moves ~20 MB/s).

In NN mode both run the march+shade per band but DEFER the cache query to
one frame-global compacted pass (pathtrace.render_band_deferred /
finish_deferred): per-band query fractions vary 0.00-0.40 against a ~0.14
frame mean, so per-band caps either waste slots in sky bands or silently
drop queries in cloud bands; the global pass does neither.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from neuralradiancecaching_tpu.config import NRCConfig
from neuralradiancecaching_tpu.models import nrc
from neuralradiancecaching_tpu.render import pathtrace
from neuralradiancecaching_tpu.scene.camera import pixel_rays
from neuralradiancecaching_tpu.scene.scene import Scene


@partial(jax.jit, static_argnames=("cfg",))
def _band_deferred(scene: Scene, key: jax.Array, ro: jnp.ndarray,
                   rd: jnp.ndarray, cfg: NRCConfig):
    return pathtrace.render_band_deferred(scene, cfg, ro, rd, key)


@partial(jax.jit, static_argnames=("cfg",))
def _band_plain(scene: Scene, key: jax.Array, ro: jnp.ndarray,
                rd: jnp.ndarray, cfg: NRCConfig):
    rgb, _ = pathtrace.render_image(scene, cfg, ro, rd, key, query_fn=None)
    return rgb


@partial(jax.jit, static_argnames=("cfg",))
def _finish(state: nrc.NRCState, baked: jnp.ndarray, scene: Scene,
            rgb, trans, q_pos, q_dir, q_w, ev, cfg: NRCConfig,
            env_rgb=None):
    query_fn = nrc.make_baked_query_fn(state, baked, cfg)

    # rays recomputed in-program (camera math is trivial; passing 2M-row
    # rays eagerly would cost host dispatches per frame)
    ro, rd = pixel_rays(scene.camera, cfg.render.width, cfg.render.height)
    spp = cfg.render.spp
    if spp > 1:  # virtual-ray expansion (see _bands_program)
        ro, rd = jnp.tile(ro, (spp, 1)), jnp.tile(rd, (spp, 1))
        if env_rgb is not None:
            env_rgb = jnp.tile(env_rgb, (spp, 1))
    out = pathtrace.finish_deferred(scene, cfg, ro, rd, rgb, trans,
                                    q_pos, q_dir, q_w, query_fn, events=ev,
                                    env_rgb=env_rgb)
    if spp > 1:
        # mean over the sample-major copies; the env composite is linear
        # in trans, so per-copy composite + mean == mean + composite
        out = out.reshape(spp, -1, 3).mean(axis=0)
    return out


@partial(jax.jit, static_argnames=("cfg",))
def frame_env_color(scene: Scene, cfg: NRCConfig) -> jnp.ndarray:
    """Direct env radiance per pixel (N, 3) for the current camera.

    Static per camera pose: progressive/bench loops compute it once and
    pass it to render_banded, removing the ~45 ms/frame full-frame env
    gather from the per-frame critical path (recompute on camera move)."""
    _, rd = pixel_rays(scene.camera, cfg.render.width, cfg.render.height)
    from neuralradiancecaching_tpu.ops import envmap as envmap_ops
    return envmap_ops.sample_direct(scene.env, rd, hpm=False)


@partial(jax.jit, static_argnames=("cfg",))
def frame_entry_tau(scene: Scene, cfg: NRCConfig) -> jnp.ndarray:
    """Exact entry optical depth per pixel ray (N,) for the current pose
    (PathTraceConfig.entry_tau_steps quadrature from the analytic AABB
    entry point). Static per camera pose, like frame_env_color: computing
    it in-program costs ~20x the march's gather volume (19.1 -> 6.7
    Mrays/s measured at 1080p), hoisted it is one bake per camera move.
    Zeros when entry_tau_steps == 0 (the walk then keeps the row tau)."""
    from neuralradiancecaching_tpu.ops import volume as volume_ops
    vol = cfg.volume
    ro, rd = pixel_rays(scene.camera, cfg.render.width, cfg.render.height)
    if cfg.path.entry_tau_steps <= 0 or cfg.path.sampler != "collision":
        return jnp.zeros((ro.shape[0],), ro.dtype)
    entry, exit_p, _ = volume_ops.entry_exit_points(ro, rd, vol.box_size,
                                                    vol.box_center)
    t_e = volume_ops.transmittance(scene.density, entry, exit_p,
                                   cfg.path.entry_tau_steps, vol)
    return jnp.minimum(-jnp.log(jnp.maximum(t_e, 1e-20)), 40.0)


def render_tiled(state: nrc.NRCState, scene: Scene, key: jax.Array,
                 cfg: NRCConfig, band_rows: int = 128) -> jnp.ndarray:
    """Render (H, W, 3) with a host-side loop over `band_rows`-row bands.

    Returns a DEVICE array; np.asarray() it once if host bytes are needed.
    """
    h, w = cfg.render.height, cfg.render.width
    ro, rd = pixel_rays(scene.camera, w, h)
    assert h % band_rows == 0, (h, band_rows)
    rob = ro.reshape(h // band_rows, band_rows * w, 3)
    rdb = rd.reshape(h // band_rows, band_rows * w, 3)
    if not cfg.render.use_nn:
        bands = [_band_plain(scene, jax.random.fold_in(key, y0 * band_rows),
                             rob[y0], rdb[y0], cfg)
                 for y0 in range(h // band_rows)]
        return jnp.concatenate(bands, axis=0).reshape(h, w, 3)

    assert cfg.render.spp == 1, (
        "render_tiled's NN path is spp=1 (host loop); render_banded "
        "implements in-program spp via virtual-ray expansion")
    parts = [_band_deferred(scene, jax.random.fold_in(key, y0 * band_rows),
                            rob[y0], rdb[y0], cfg)
             for y0 in range(h // band_rows)]
    rgb, trans, qp, qd, qw, ev = (
        jnp.concatenate([p[i] for p in parts], axis=0) for i in range(6))
    baked = nrc.bake(state, cfg)
    out = _finish(state, baked, scene, rgb, trans, qp, qd, qw, ev, cfg)
    return out.reshape(h, w, 3)


@partial(jax.jit, static_argnames=("cfg", "band_rows"))
def _bands_program(scene: Scene, key: jax.Array, cfg: NRCConfig,
                   band_rows: int, entry_tau=None):
    """lax.map over row bands: march + shade, queries deferred."""
    h, w = cfg.render.height, cfg.render.width
    n_bands = h // band_rows
    ro, rd = pixel_rays(scene.camera, w, h)
    ro_b = ro.reshape(n_bands, band_rows * w, 3)
    rd_b = rd.reshape(n_bands, band_rows * w, 3)
    if entry_tau is None and cfg.path.entry_tau_steps > 0             and cfg.path.sampler == "collision" and cfg.render.use_nn:
        entry_tau = frame_entry_tau(scene, cfg)  # pose-static; see helper
    et_b = (entry_tau.reshape(n_bands, band_rows * w)
            if entry_tau is not None else None)
    y0s = jnp.arange(n_bands, dtype=jnp.int32) * band_rows

    if not cfg.render.use_nn:
        def band_plain(args):
            y0, ro_i, rd_i = args
            rgb, _ = pathtrace.render_image(scene, cfg, ro_i, rd_i,
                                            jax.random.fold_in(key, y0),
                                            query_fn=None)
            return rgb

        return jax.lax.map(band_plain, (y0s, ro_b, rd_b))

    if cfg.render.spp > 1:
        # in-program spp: spp VIRTUAL COPIES of every band with distinct
        # keys (sample-major); the caller averages after the global finish.
        # All deferred-record machinery (caps, compaction, event segsum)
        # is per-lane, so it is unchanged by the expansion; peak deferred
        # buffers scale by spp (fine at quality-run sizes; 1080p
        # production keeps spp=1 + host accumulation).
        s = cfg.render.spp
        ro_b = jnp.tile(ro_b, (s, 1, 1))
        rd_b = jnp.tile(rd_b, (s, 1, 1))
        if et_b is not None:
            et_b = jnp.tile(et_b, (s, 1))
        y0s = jnp.arange(n_bands * s, dtype=jnp.int32) * band_rows

    if et_b is not None:
        def band(args):
            y0, ro_i, rd_i, et_i = args
            return pathtrace.render_band_deferred(
                scene, cfg, ro_i, rd_i, jax.random.fold_in(key, y0),
                entry_tau=et_i)

        return jax.lax.map(band, (y0s, ro_b, rd_b, et_b))

    def band(args):
        y0, ro_i, rd_i = args
        return pathtrace.render_band_deferred(scene, cfg, ro_i, rd_i,
                                              jax.random.fold_in(key, y0))

    return jax.lax.map(band, (y0s, ro_b, rd_b))


@partial(jax.jit, static_argnames=("cfg",))
def _live_mask_mean(scene: Scene, cfg: NRCConfig) -> jnp.ndarray:
    from neuralradiancecaching_tpu.ops import lightfield
    from neuralradiancecaching_tpu.ops import volume as volume_ops
    vol = cfg.volume
    ro, rd = pixel_rays(scene.camera, cfg.render.width, cfg.render.height)
    entry, _, hit = volume_ops.entry_exit_points(ro, rd, vol.box_size,
                                                 vol.box_center)
    tau0 = lightfield.query_tau_field(scene.env_t_field, entry, rd, vol)
    return jnp.mean(
        (hit & (tau0 > cfg.render.live_tau_threshold)).astype(jnp.float32))


def live_fraction(scene: Scene, cfg: NRCConfig) -> float:
    """EXACT fraction of pixel rays with nonzero optical depth at entry
    for the current camera pose (deterministic: analytic AABB entry +
    baked tau-field gather, no RNG). Any live_pack_fraction >= this is
    drop-free -- the probe bench.py and the progressive CLI use to tune
    the frame-global live-ray pack."""
    return float(np.asarray(_live_mask_mean(scene, cfg)))


@partial(jax.jit, static_argnames=("cfg", "band_rows", "multiple_of"))
def frame_live_pack(scene: Scene, cfg: NRCConfig, band_rows: int = 54,
                    multiple_of: int = 1):
    """Pose-static live-ray pack (sel, val, ro_p, rd_p) for the packed
    bands program.

    The live mask is DETERMINISTIC per camera pose (analytic AABB entry +
    baked tau-field gather, no RNG), so the full-frame compact_select
    (~38 ms at 1080p, docs/PERFORMANCE.md finish decomposition) and the
    two packed-ray gathers are static across every frame rendered from
    one pose. Progressive/bench loops compute this once per pose and pass
    it to :func:`render_banded` (recompute on camera move), exactly like
    ``frame_env_color``/``baked``.

    multiple_of: round the packed band count up to this multiple (the
    mesh size, for the DP packed render's whole-bands-per-device
    striping). Extra bands are padding (val False), so a pack built with
    multiple_of=N is bit-compatible with the multiple_of=1 pack on the
    valid lanes."""
    from neuralradiancecaching_tpu.ops import compact, lightfield
    from neuralradiancecaching_tpu.ops import volume as volume_ops

    h, w = cfg.render.height, cfg.render.width
    n = h * w
    vol = cfg.volume
    ro, rd = pixel_rays(scene.camera, w, h)
    entry, _, hit = volume_ops.entry_exit_points(ro, rd, vol.box_size,
                                                 vol.box_center)
    tau0 = lightfield.query_tau_field(scene.env_t_field, entry, rd, vol)
    live = hit & (tau0 > cfg.render.live_tau_threshold)

    band_n = band_rows * w
    n_bands_p = max(1, -(-int(n * cfg.render.live_pack_fraction) // band_n))
    n_bands_p = -(-n_bands_p // multiple_of) * multiple_of
    capm = min(n_bands_p * band_n, n)
    sel, val = compact.compact_select(live, capm)
    ro_p = jnp.take(ro, sel, axis=0).reshape(-1, band_n, 3)
    rd_p = jnp.take(rd, sel, axis=0).reshape(-1, band_n, 3)
    # exact entry tau over the PACKED lanes (pose-static like the pack
    # itself; see frame_entry_tau -- in-program it costs ~20x the march's
    # gather volume). Padding lanes get 0 (their outputs are masked).
    if cfg.path.entry_tau_steps > 0 and cfg.path.sampler == "collision":
        ro_f = ro_p.reshape(-1, 3)
        rd_f = rd_p.reshape(-1, 3)
        entry, exit_p, _ = volume_ops.entry_exit_points(
            ro_f, rd_f, vol.box_size, vol.box_center)
        t_e = volume_ops.transmittance(scene.density, entry, exit_p,
                                       cfg.path.entry_tau_steps, vol)
        et_p = jnp.minimum(-jnp.log(jnp.maximum(t_e, 1e-20)),
                           40.0).reshape(-1, band_n)
        et_p = jnp.where(val.reshape(-1, band_n), et_p, 0.0)
    else:
        et_p = jnp.zeros(ro_p.shape[:2], ro_p.dtype)
    # inverse map: turns the per-frame un-pack into ONE gather (the two
    # full-width scatters move here, off the per-frame path)
    inv = compact.inverse_select(n, sel, val)
    return sel, val, ro_p, rd_p, inv, et_p


@partial(jax.jit, static_argnames=("cfg", "band_rows"))
def _packed_bands_program(scene: Scene, key: jax.Array, cfg: NRCConfig,
                          band_rows: int, pack=None):
    """Frame-global live-ray packing (RenderConfig.live_pack_fraction):
    one tau-field gather over the whole frame retires rays with zero
    optical depth at entry (analytically exact: T0 = 1, pure env), the
    march runs banded over only the packed live rays.

    pack: precomputed :func:`frame_live_pack` (pose-static); computed
    in-program when not supplied."""
    w = cfg.render.width
    if pack is None:
        pack = frame_live_pack(scene, cfg, band_rows)
    sel, val, ro_p, rd_p, inv, et_p = pack
    band_n = band_rows * w
    capm = ro_p.shape[0] * band_n
    ro_p = ro_p.reshape(-1, band_n, 3)
    rd_p = rd_p.reshape(-1, band_n, 3)
    et_p = et_p.reshape(-1, band_n)

    # in-program spp over the PACKED lanes: the live mask is per pixel ray
    # (the spp copies share origin/direction, only the walk keys differ --
    # TracePathMultiple semantics, nrc-forward.frag:824-834), so one pack
    # serves all copies and the spp expansion marches spp * capm lanes
    # instead of spp * n -- quality runs keep the full live-pack saving
    spp = cfg.render.spp
    if spp > 1:
        ro_p = jnp.tile(ro_p, (spp, 1, 1))  # copy-major, like _bands_program
        rd_p = jnp.tile(rd_p, (spp, 1, 1))
        et_p = jnp.tile(et_p, (spp, 1))

    def band(args):
        i, ro_i, rd_i, et_i = args
        return pathtrace.render_band_deferred(scene, cfg, ro_i, rd_i,
                                              jax.random.fold_in(key, i),
                                              entry_tau=et_i)

    ids = jnp.arange(spp * (capm // band_n), dtype=jnp.int32)
    rgb, trans, qp, qd, qw, ev = jax.lax.map(band, (ids, ro_p, rd_p, et_p))
    rgb = rgb.reshape(-1, 3)
    trans = trans.reshape(-1)
    qp, qd = qp.reshape(-1, 3), qd.reshape(-1, 3)
    # padding lanes marched duplicate rays -- mask their outputs
    val_s = jnp.tile(val, spp) if spp > 1 else val
    qw = jnp.where(val_s, qw.reshape(-1), 0.0)
    ev = ev.reshape((spp * capm,) + ev.shape[2:])
    if ev.shape[1] > 0:
        ev = jnp.where(val_s[:, None, None], ev, jnp.zeros((), ev.dtype))
    return inv, rgb, trans, qp, qd, qw, ev


@partial(jax.jit, static_argnames=("cfg",))
def _finish_packed(state: nrc.NRCState, baked: jnp.ndarray, scene: Scene,
                   inv, rgb_p, trans_p, qp, qd, qw, ev,
                   cfg: NRCConfig, env_rgb=None):
    from neuralradiancecaching_tpu.ops import compact
    from neuralradiancecaching_tpu.ops import envmap as envmap_ops

    query_fn = nrc.make_baked_query_fn(state, baked, cfg)

    n = cfg.render.width * cfg.render.height
    spp = cfg.render.spp
    # cap fractions stay frame-relative: spp copies record spp x the
    # frame-mean query/event counts
    rgb_p = pathtrace.shade_and_query(scene, cfg, rgb_p, qp, qd, qw,
                                      query_fn, events=ev, cap_n=spp * n)
    if spp > 1:
        # mean over the sample-major copies BEFORE the un-pack: the pack
        # indices are shared by every copy and the env composite is
        # linear in (rgb, trans), so mean-then-unpack == unpack-then-mean
        rgb_p = rgb_p.reshape(spp, -1, 3).mean(axis=0)
        trans_p = trans_p.reshape(spp, -1).mean(axis=0)
    # fused un-pack: one (n, 4) gather through the pose-static inverse map
    # replaces two full-width scatters (rgb fill 0, trans fill 1)
    rgbt = jnp.concatenate([rgb_p, trans_p[:, None]], axis=1)
    out = compact.gather_back(inv, rgbt,
                              jnp.asarray([0.0, 0.0, 0.0, 1.0], rgbt.dtype))
    rgb, trans = out[:, :3], out[:, 3]
    if env_rgb is None:
        _, rd = pixel_rays(scene.camera, cfg.render.width,
                           cfg.render.height)
        env_rgb = envmap_ops.sample_direct(scene.env, rd, hpm=False)
    return rgb + trans[:, None] * env_rgb


def render_banded(state: nrc.NRCState, scene: Scene, key: jax.Array,
                  cfg: NRCConfig, band_rows: int = 54,
                  env_rgb=None, baked=None, pack=None,
                  entry_tau=None) -> jnp.ndarray:
    """Whole frame as TWO jitted programs: ``lax.map`` over row bands for
    the march+shade, then a frame-global compacted cache query. (One fused
    program exceeds the axon remote compile helper's size limit at 1080p;
    two dispatches cost ~5 ms and compile everywhere.)

    Numerically identical to :func:`render_tiled` with the same band size
    (tested); transients stay band-sized because lax.map is sequential.

    env_rgb: precomputed :func:`frame_env_color` (static per camera pose).
    baked: precomputed ``nrc.bake(state, cfg)`` -- pass it when rendering
    several frames from one cache state (bench) or baking every N frames
    of a training run (cache drift per frame is tiny at production lr).
    pack: precomputed :func:`frame_live_pack` (static per camera pose,
    same band_rows/live_pack_fraction as this call); it carries the
    packed exact entry tau.
    entry_tau: precomputed :func:`frame_entry_tau` for the UNPACKED
    banded path (the packed path gets it from the pack); computed
    in-program per frame when omitted (correct but ~20x the march's
    gather volume -- hoist it in frame loops).
    """
    h, w = cfg.render.height, cfg.render.width
    assert h % band_rows == 0, (h, band_rows)
    if not cfg.render.use_nn:
        out = _bands_program(scene, key, cfg, band_rows)
        return out.reshape(h, w, 3)

    if baked is None:
        baked = nrc.bake(state, cfg)
    if (cfg.render.live_pack_fraction > 0.0 and pathtrace.shade_deferred(cfg)
            and not cfg.render.show_non_nn):
        inv, rgb_p, trans_p, qp, qd, qw, ev = _packed_bands_program(
            scene, key, cfg, band_rows, pack)
        out = _finish_packed(state, baked, scene, inv, rgb_p, trans_p,
                             qp, qd, qw, ev, cfg, env_rgb)
        return out.reshape(h, w, 3)

    rgb, trans, qp, qd, qw, ev = _bands_program(scene, key, cfg, band_rows,
                                                entry_tau)
    ev = ev.reshape((ev.shape[0] * ev.shape[1],) + ev.shape[2:])
    out = _finish(state, baked, scene, rgb.reshape(-1, 3),
                  trans.reshape(-1), qp.reshape(-1, 3), qd.reshape(-1, 3),
                  qw.reshape(-1), ev, cfg, env_rgb)
    return out.reshape(h, w, 3)
