"""Data-parallel frame/train/render steps via shard_map.

Sharding layout (SURVEY.md §2 'TPU-native equivalent'):
  * rays / pixels: sharded over the ``data`` mesh axis (leading dim);
  * NRC params + optimizer state + scene: replicated;
  * gradient + loss reduction: ``pmean`` over ICI -- this psum replaces the
    reference's single-GPU float-atomicAdd global reduction;
  * optimizer updates run identically on every device, keeping the
    replicated state bit-identical with zero parameter traffic.

Per-device RNG keys are folded with the device's axis index so ray i on
device 0 and ray i on device 1 draw independent randomness.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from neuralradiancecaching_tpu.config import NRCConfig
from neuralradiancecaching_tpu.models import nrc
from neuralradiancecaching_tpu.parallel.mesh import DATA_AXIS
from neuralradiancecaching_tpu.render import pathtrace, targets
from neuralradiancecaching_tpu.scene.camera import pixel_rays
from neuralradiancecaching_tpu.scene.scene import Scene


def _device_key(key: jax.Array) -> jax.Array:
    return jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))


def _local_train_grads(state: nrc.NRCState, scene: Scene, key: jax.Array,
                       cfg: NRCConfig, ro, rd):
    """Per-device: vertex selection + targets + grads on the local shard
    of the train_ray_pool (same batched tracer and the same POOL as the
    single-chip path -- pool construction happens before sharding, so the
    oversample copies and grid jitter are sharded, not rebuilt per
    device), then cross-device mean."""
    batch = targets.generate_train_batch_for_rays(scene, cfg,
                                                  _device_key(key), ro, rd,
                                                  expanded=True)
    grads, mse = nrc.compute_grads(state, batch.pos, batch.dir, batch.target,
                                   cfg)
    grads = jax.lax.pmean(grads, DATA_AXIS)
    mse = jax.lax.pmean(mse, DATA_AXIS)
    return grads, mse


def _local_render(state: nrc.NRCState, scene: Scene, key: jax.Array,
                  cfg: NRCConfig, ro, rd) -> jnp.ndarray:
    # dense-bake once per device (replicated state -> identical bake)
    baked = nrc.bake(state, cfg)

    query_fn = nrc.make_baked_query_fn(state, baked, cfg)

    rgb, _ = pathtrace.render_image(scene, cfg, ro, rd, _device_key(key),
                                    query_fn=query_fn)
    return rgb


def _check_divisible(mesh, *counts) -> None:
    n = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    for c in counts:
        if c % n != 0:
            raise ValueError(
                f"ray/pixel count {c} must be divisible by the mesh size "
                f"{n}; adjust train_width/train_height or render width x "
                f"height")


@partial(jax.jit, static_argnames=("cfg", "mesh"))
def dp_train_step(state: nrc.NRCState, scene: Scene, key: jax.Array,
                  cfg: NRCConfig, mesh) -> Tuple[nrc.NRCState, jnp.ndarray]:
    """Data-parallel online training pass: the full train_ray_pool
    (jittered grid x vertex_oversample copies) is built once and SHARDED
    over devices; each device compacts its share of RR-cut vertices and
    the gradients pmean across the mesh."""
    _check_divisible(mesh, cfg.train.n_rays)
    k_pool, key = jax.random.split(key)
    ro, rd = targets.train_ray_pool(scene, cfg, k_pool)

    def body(state, scene, key, ro, rd):
        grads, mse = _local_train_grads(state, scene, key, cfg, ro, rd)
        return nrc.apply_grads(state, grads, cfg), mse

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False)
    return fn(state, scene, key, ro, rd)


@partial(jax.jit, static_argnames=("cfg", "mesh"))
def dp_render(state: nrc.NRCState, scene: Scene, key: jax.Array,
              cfg: NRCConfig, mesh) -> jnp.ndarray:
    """Data-parallel render: pixels sharded, returns (H, W, 3)."""
    _check_divisible(mesh, cfg.render.width * cfg.render.height)
    ro, rd = pixel_rays(scene.camera, cfg.render.width, cfg.render.height)
    fn = jax.shard_map(
        lambda s, sc, k, o, d: _local_render(s, sc, k, cfg, o, d),
        mesh=mesh,
        in_specs=(P(), P(), P(), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_vma=False)
    rgb = fn(state, scene, key, ro, rd)
    return rgb.reshape(cfg.render.height, cfg.render.width, 3)


@partial(jax.jit, static_argnames=("cfg", "mesh", "band_rows"))
def dp_render_banded_packed(state: nrc.NRCState, scene: Scene,
                            key: jax.Array, cfg: NRCConfig, mesh,
                            band_rows: int = 54, env_rgb=None, baked=None,
                            pack=None) -> jnp.ndarray:
    """Frame-global live-ray packing on a mesh: the pose-static pack
    (render.tiled.frame_live_pack, multiple_of = mesh size) groups the
    live rays into virtual bands, whole packed bands stripe across
    devices (device d takes packed bands d, d+n, ...), each device
    marches + shades + queries only its live lanes, and the finish
    scatters the packed results back to pixel order globally.

    Bit-parity with the single-chip packed path: bands are keyed by their
    GLOBAL packed band id (exactly the fold_in ids of
    tiled._packed_bands_program), and a multiple_of=N pack only APPENDS
    padding bands vs the multiple_of=1 pack -- so mesh(1), mesh(8), and
    render_banded(pack=...) all produce the same image for the same pack.

    Per-shard caps: each device's lanes are contiguous packed bands, so
    per-shard event/query fractions track the frame mean the same way
    band striping does. For bench-tight caps, probe them per shard with
    ``probe_dp_caps(..., pack=pack)`` -- it sizes the fractions to the
    worst shard under this exact packed striping (drop-free by
    construction); otherwise keep the drop-free config defaults."""
    from neuralradiancecaching_tpu.ops import compact
    from neuralradiancecaching_tpu.ops import envmap as envmap_ops
    from neuralradiancecaching_tpu.render import tiled

    h, w = cfg.render.height, cfg.render.width
    n = h * w
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    if h % (n_dev * band_rows) != 0:
        raise ValueError(
            f"height {h} must divide into {n_dev} devices x {band_rows}-row "
            f"bands")
    if pack is None:
        pack = tiled.frame_live_pack(scene, cfg, band_rows,
                                     multiple_of=n_dev)
    sel, val, ro_p, rd_p, inv, et_p = pack
    band_n = band_rows * w
    n_bands_p = ro_p.shape[0]
    if n_bands_p % n_dev != 0:
        raise ValueError(
            f"packed band count {n_bands_p} must be divisible by the mesh "
            f"size {n_dev}; build the pack with multiple_of=mesh size")
    if baked is None:
        baked = nrc.bake(state, cfg)

    # stripe packed bands: device d holds packed bands d, d+n_dev, ...
    band_of_dev = np.arange(n_bands_p).reshape(-1, n_dev).T.reshape(-1)
    inverse = np.argsort(band_of_dev)
    ro_s = ro_p[band_of_dev]
    rd_s = rd_p[band_of_dev]
    et_s = et_p.reshape(n_bands_p, band_n)[band_of_dev]
    val_s = val.reshape(n_bands_p, band_n)[band_of_dev].reshape(-1)
    band_ids = jnp.asarray(band_of_dev.reshape(n_dev, -1), jnp.int32)

    def body(s, bk, sc, k, ro_l, rd_l, et_l, ids_l, val_l):
        def band(args):
            gid, ro_i, rd_i, et_i = args
            # key by GLOBAL packed band id == the single-chip packed
            # program's fold_in ids -> image independent of mesh size
            return pathtrace.render_band_deferred(
                sc, cfg, ro_i, rd_i, jax.random.fold_in(k, gid),
                entry_tau=et_i)

        rgb, trans, qp, qd, qw, ev = jax.lax.map(band,
                                                 (ids_l[0], ro_l, rd_l,
                                                  et_l))
        rgb = rgb.reshape(-1, 3)
        trans = trans.reshape(-1)
        qp, qd = qp.reshape(-1, 3), qd.reshape(-1, 3)
        # padding lanes marched duplicate rays -- mask their outputs
        qw = jnp.where(val_l, qw.reshape(-1), 0.0)
        ev = ev.reshape((ev.shape[0] * ev.shape[1],) + ev.shape[2:])
        if ev.shape[1] > 0:
            ev = jnp.where(val_l[:, None, None], ev, jnp.zeros((), ev.dtype))

        query_fn = nrc.make_baked_query_fn(s, bk, cfg)

        rgb = pathtrace.shade_and_query(sc, cfg, rgb, qp, qd, qw, query_fn,
                                        events=ev, cap_n=n // n_dev)
        return rgb, trans

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(DATA_AXIS), P(DATA_AXIS),
                  P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        check_vma=False)
    rgb_s, trans_s = fn(state, baked, scene, key, ro_s, rd_s, et_s,
                        band_ids, val_s)
    # un-stripe to canonical pack order, then un-pack to pixel order with
    # ONE (n, 4) gather through the pose-static inverse map (rgb fill 0,
    # trans fill 1) -- same fused un-pack as the single-chip finish
    unstripe = jnp.asarray(inverse)
    rgb_p = rgb_s.reshape(n_bands_p, band_n, 3)[unstripe].reshape(-1, 3)
    trans_p = trans_s.reshape(n_bands_p, band_n)[unstripe].reshape(-1)
    rgbt = jnp.concatenate([rgb_p, trans_p[:, None]], axis=1)
    out = compact.gather_back(inv, rgbt,
                              jnp.asarray([0.0, 0.0, 0.0, 1.0], rgbt.dtype))
    rgb, trans = out[:, :3], out[:, 3]
    if env_rgb is None:
        _, rd = pixel_rays(scene.camera, w, h)
        env_rgb = envmap_ops.sample_direct(scene.env, rd, hpm=False)
    return (rgb + trans[:, None] * env_rgb).reshape(h, w, 3)


@partial(jax.jit, static_argnames=("cfg", "mesh", "band_rows"))
def dp_render_banded(state: nrc.NRCState, scene: Scene, key: jax.Array,
                     cfg: NRCConfig, mesh, band_rows: int = 54,
                     env_rgb=None, baked=None) -> jnp.ndarray:
    """Data-parallel banded render: row bands STRIPED over devices (device d
    takes bands d, d+n, d+2n, ...), each device lax.map's over its local
    bands then finishes with a device-local compacted cache query.

    Striping matters twice: (a) march/shade work per band varies hugely
    between sky and cloud bands, so contiguous row blocks would leave most
    devices idle behind the cloud-heavy one; (b) the query-cap fraction per
    device stays near the frame mean (a contiguous cloud block would need
    ~3x the cap). Transients stay band-sized per device, so production
    frames compile. Returns (H, W, 3).

    Cap semantics on a mesh (ADVICE r2 / VERDICT r3 item 6): the
    shade/query cap fractions apply PER SHARD. Striping keeps per-shard
    event/query fractions close to the frame mean (that is point (b)),
    but a cap probed from the FRAME MEAN still assumes the residual
    per-shard spread fits its margin. For tight caps, probe per shard
    with ``probe_dp_caps`` -- it measures each stripe's own fractions
    under this exact band->device assignment and sizes the caps to the
    worst shard (drop-free by construction; tested against a skewed
    scene in tests/test_parallel.py). Otherwise keep the drop-free
    config defaults (shade 2.0, query 1.0)."""
    if not cfg.render.use_nn:
        raise ValueError("dp_render_banded is the NN path; use dp_render "
                         "for cache-off frames")
    if cfg.render.spp != 1:
        raise ValueError("dp_render_banded renders 1 spp per call; "
                         "accumulate frames host-side (cli progressive) or "
                         "use render_banded's in-program spp on one chip")
    h, w = cfg.render.height, cfg.render.width
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    if h % (n_dev * band_rows) != 0:
        raise ValueError(
            f"height {h} must divide into {n_dev} devices x {band_rows}-row "
            f"bands")
    n_bands = h // band_rows
    ro, rd = pixel_rays(scene.camera, w, h)
    # stripe: order bands so device d holds global bands d, d+n_dev, ...
    band_of_dev = np.arange(n_bands).reshape(-1, n_dev).T.reshape(-1)
    inverse = np.argsort(band_of_dev)
    ro_s = ro.reshape(n_bands, band_rows * w, 3)[band_of_dev].reshape(-1, 3)
    rd_s = rd.reshape(n_bands, band_rows * w, 3)[band_of_dev].reshape(-1, 3)
    band_ids = jnp.asarray(band_of_dev.reshape(n_dev, -1), jnp.int32)
    # hoisted per-camera env composite: reorder to stripe order so each
    # device's shard lines up with its rays (same hoist as single-chip
    # render_banded; recompute per camera move)
    env_s = (env_rgb.reshape(n_bands, band_rows * w, 3)[band_of_dev]
             .reshape(-1, 3) if env_rgb is not None else None)
    if baked is None:
        baked = nrc.bake(state, cfg)

    def body(s, bk, sc, k, ro_l, rd_l, ids_l, env_l):
        bands = ro_l.shape[0] // (band_rows * w)
        ro_b = ro_l.reshape(bands, band_rows * w, 3)
        rd_b = rd_l.reshape(bands, band_rows * w, 3)
        if cfg.path.entry_tau_steps > 0 and cfg.path.sampler == "collision":
            # exact entry tau over this shard's rays (one batched
            # quadrature per band via the map; pose-static, so a future
            # hoist could lift it like env_rgb -- the packed DP path
            # already does, via the pack)
            from neuralradiancecaching_tpu.ops import volume as volume_ops
            vol = cfg.volume
            entry, exit_p, _ = volume_ops.entry_exit_points(
                ro_l, rd_l, vol.box_size, vol.box_center)
            t_e = volume_ops.transmittance(sc.density, entry, exit_p,
                                           cfg.path.entry_tau_steps, vol)
            et_b = jnp.minimum(-jnp.log(jnp.maximum(t_e, 1e-20)),
                               40.0).reshape(bands, band_rows * w)

            def band(args):
                gid, ro_i, rd_i, et_i = args
                return pathtrace.render_band_deferred(
                    sc, cfg, ro_i, rd_i,
                    jax.random.fold_in(k, gid * band_rows), entry_tau=et_i)

            rgb, trans, qp, qd, qw, ev = jax.lax.map(
                band, (ids_l[0], ro_b, rd_b, et_b))
        else:
            def band(args):
                gid, ro_i, rd_i = args
                # key by GLOBAL band id -> image independent of mesh size
                return pathtrace.render_band_deferred(
                    sc, cfg, ro_i, rd_i,
                    jax.random.fold_in(k, gid * band_rows))

            rgb, trans, qp, qd, qw, ev = jax.lax.map(band,
                                                     (ids_l[0], ro_b, rd_b))

        query_fn = nrc.make_baked_query_fn(s, bk, cfg)

        out = pathtrace.finish_deferred(
            sc, cfg, ro_l, rd_l, rgb.reshape(-1, 3), trans.reshape(-1),
            qp.reshape(-1, 3), qd.reshape(-1, 3), qw.reshape(-1), query_fn,
            events=ev.reshape((ev.shape[0] * ev.shape[1],) + ev.shape[2:]),
            env_rgb=env_l)
        return out

    env_spec = P(DATA_AXIS) if env_s is not None else P()
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(DATA_AXIS), P(DATA_AXIS),
                  P(DATA_AXIS), env_spec),
        out_specs=P(DATA_AXIS),
        check_vma=False)
    rgb = fn(state, baked, scene, key, ro_s, rd_s, band_ids, env_s)
    rgb = rgb.reshape(n_bands, band_rows * w, 3)[jnp.asarray(inverse)]
    return rgb.reshape(h, w, 3)


@partial(jax.jit, static_argnames=("cfg", "mesh", "train"))
def dp_frame_step(state: nrc.NRCState, scene: Scene, key: jax.Array,
                  cfg: NRCConfig, mesh, train: bool = True):
    """Full data-parallel frame: sharded train pass -> replicated optimizer
    update -> sharded render. The multi-chip equivalent of
    ``render.frame.frame_step``.

    Returns (state, image (H, W, 3), mse scalar).
    """
    _check_divisible(mesh, cfg.train.n_rays,
                     cfg.render.width * cfg.render.height)
    k_pool, k_train, k_render = jax.random.split(key, 3)
    tro, trd = targets.train_ray_pool(scene, cfg, k_pool)
    rro, rrd = pixel_rays(scene.camera, cfg.render.width, cfg.render.height)

    def body(state, scene, kt, kr, tro, trd, rro, rrd):
        if train:
            grads, mse = _local_train_grads(state, scene, kt, cfg, tro, trd)
            state = nrc.apply_grads(state, grads, cfg)
        else:
            mse = jnp.float32(0.0)
        rgb = _local_render(state, scene, kr, cfg, rro, rrd)
        return state, rgb, mse

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(DATA_AXIS), P(DATA_AXIS),
                  P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P(DATA_AXIS), P()),
        check_vma=False)
    state, rgb, mse = fn(state, scene, k_train, k_render, tro, trd, rro, rrd)
    return state, rgb.reshape(cfg.render.height, cfg.render.width, 3), mse


def dp_train_banded_frame(state: nrc.NRCState, scene: Scene, key: jax.Array,
                          cfg: NRCConfig, mesh, band_rows: int = 54,
                          env_rgb=None, baked=None, pack=None):
    """The PRODUCTION multi-chip frame (the distributed version of the
    reference frame loop, src/main.cpp:181-246): sharded train pass ->
    pmean grads -> replicated optimizer update, then the striped banded
    render with the updated cache.

    Two device programs per frame, exactly like the single-chip production
    path (render.tiled.render_banded): one fused program at 1080p exceeds
    the remote compile helper's size limit, and the split costs ~5 ms.
    ``env_rgb``/``baked`` are the same per-camera/per-state hoists as the
    single-chip path; when ``baked`` is None the render re-bakes from the
    freshly updated state.

    Runs unmodified on a 1-device mesh (today's single chip) and on a
    v5e-8 (rays/pixels resharded, no code change). Returns
    (state, image (H, W, 3), mse, baked) -- `baked` so amortizing callers
    (cli --bake-every) can reuse the in-step bake instead of re-baking.
    """
    state, mse = dp_train_step(state, scene, key, cfg, mesh)
    if baked is None:
        baked = nrc.bake(state, cfg)
    k_render = jax.random.fold_in(key, 0x52454e)
    if (cfg.render.live_pack_fraction > 0.0 and pathtrace.shade_deferred(cfg)
            and not cfg.render.show_non_nn and cfg.render.spp == 1):
        img = dp_render_banded_packed(state, scene, k_render, cfg, mesh,
                                      band_rows=band_rows, env_rgb=env_rgb,
                                      baked=baked, pack=pack)
    else:
        img = dp_render_banded(state, scene, k_render, cfg, mesh,
                               band_rows=band_rows, env_rgb=env_rgb,
                               baked=baked)
    return state, img, mse, baked


class DPCapReport(NamedTuple):
    """Per-shard probe results + the worst-shard-sized cap fractions.

    All fractions are relative to the per-device cap base (n_pixels /
    n_dev), i.e. directly comparable to RenderConfig.query_cap_fraction /
    shade_cap_fraction as finish_deferred / shade_and_query apply them on
    a mesh."""
    query_frac: np.ndarray      # (n_dev,) measured query fraction per shard
    event_mean: np.ndarray      # (n_dev,) measured live events per cap lane
    live_frac: np.ndarray       # (n_dev,) exact entry-live fraction (banded)
    query_cap: float            # tightened drop-free query_cap_fraction
    shade_cap: float            # tightened drop-free shade_cap_fraction


def _round_cap(x: float, margin: float, pad: float) -> float:
    return float(np.ceil((x * margin + pad) / 0.015625) * 0.015625)


def probe_dp_caps(scene: Scene, cfg: NRCConfig, mesh_n: int,
                  band_rows: int = 54, key: Optional[jax.Array] = None,
                  stride: Optional[int] = None, margin: float = 1.05,
                  pack=None) -> Tuple[NRCConfig, DPCapReport]:
    """Per-shard cap probe for the striped banded DP renders (the mesh
    version of bench.py's single-chip cap tuning).

    The shade/query caps apply PER SHARD on a mesh (each device's
    finish_deferred / shade_and_query compacts only its local lanes
    against base = n_pixels / n_dev), so a cap probed from the frame MEAN
    silently risks shard-local drops wherever band striping leaves a
    residual spread. This probe measures each shard's own fractions under
    the exact band->device assignment dp_render_banded[_packed] uses
    (device d takes bands d, d+n_dev, ...), sizes the caps to the WORST
    shard with bench.py's margin + 1/64 granularity, and returns a
    tightened cfg that is drop-free per shard by construction.

    Probe legs (mirroring bench.py):
      * query fraction  -- strided trace_path sample, per-ray query mask
        grouped by the owning device;
      * shade events    -- strided trace_path_collision(collect_events)
        per-ray live-event counts grouped by device (deferred-shade
        pipelines only);
      * entry-live      -- exact (deterministic per pose) per-stripe
        fraction, reported for observability.

    With ``pack`` (a frame_live_pack result), rays and the device
    assignment come from the PACKED lanes (packed band b -> device
    b % n_dev) and fractions are rescaled by lanes_per_device / cap_base,
    matching dp_render_banded_packed's cap_n = n // n_dev semantics.
    """
    from neuralradiancecaching_tpu.ops import lightfield
    from neuralradiancecaching_tpu.ops import volume as vol_ops

    h, w = cfg.render.height, cfg.render.width
    n = h * w
    band_n = band_rows * w
    base = n // mesh_n  # per-device cap base (cap_n in the DP renders)
    if key is None:
        key = jax.random.PRNGKey(97)
    if pack is not None:
        _, val, ro_p, rd_p, _, _ = pack
        ro_f = ro_p.reshape(-1, 3)
        rd_f = rd_p.reshape(-1, 3)
        n_lanes = ro_f.shape[0]
        lane_dev = (np.arange(n_lanes) // band_n) % mesh_n
        lane_w = np.asarray(val, np.float64)  # padding lanes don't record
    else:
        ro_f, rd_f = pixel_rays(scene.camera, w, h)
        n_lanes = n
        lane_dev = (np.arange(n) // band_n) % mesh_n
        lane_w = np.ones((n,), np.float64)
    valid_per_dev = np.bincount(lane_dev, weights=lane_w, minlength=mesh_n)

    if stride is None:
        stride = max(1, n_lanes // (w * 64))
    idx = np.arange(0, n_lanes, stride)
    dev = lane_dev[idx]
    w_s = lane_w[idx]
    # valid sampled lanes per device (the strided sample hits every stripe
    # uniformly: stride is coprime-ish to the band layout and bands stripe
    # round-robin)
    samp_valid = np.maximum(np.bincount(dev, weights=w_s, minlength=mesh_n),
                            1.0)

    deferred = pathtrace.shade_deferred(cfg)
    if deferred:
        res, ev = pathtrace.trace_path_collision(
            scene, cfg, ro_f[idx], rd_f[idx], key, use_nn=True,
            collect_events=True)
        counts = np.asarray((np.asarray(ev[..., 6]) > 0).sum(axis=1),
                            np.float64)
        ev_slots = int(ev.shape[1])
    else:
        res = pathtrace.trace_path(scene, cfg, ro_f[idx], rd_f[idx], key,
                                   use_nn=True)
        counts = np.zeros((idx.size,), np.float64)
        ev_slots = 0
    qmask = np.asarray(np.asarray(res.query_weight) > 0, np.float64) * w_s
    # needed fraction_d = (estimated total on shard d) / cap base, where
    # total_d = mean-per-valid-sampled-lane * valid lanes on the shard
    qfrac = (np.bincount(dev, weights=qmask, minlength=mesh_n) / samp_valid
             * valid_per_dev / base)
    ev_frac = (np.bincount(dev, weights=counts * w_s, minlength=mesh_n)
               / samp_valid * valid_per_dev / base)

    # exact per-stripe entry-live fraction (pixel-order bands)
    ro_px, rd_px = pixel_rays(scene.camera, w, h)
    entry_p, _, hit_m = vol_ops.entry_exit_points(ro_px, rd_px,
                                                  cfg.volume.box_size,
                                                  cfg.volume.box_center)
    tau0 = lightfield.query_tau_field(scene.env_t_field, entry_p, rd_px,
                                      cfg.volume)
    live = (np.asarray(hit_m)
            & (np.asarray(tau0) > cfg.render.live_tau_threshold)
            ).astype(np.float64)
    live_dev = (np.arange(n) // band_n) % mesh_n
    live_frac = (np.bincount(live_dev, weights=live, minlength=mesh_n)
                 / np.maximum(np.bincount(live_dev, minlength=mesh_n), 1.0))

    query_cap = min(1.0, _round_cap(float(qfrac.max()), margin, 0.005))
    shade_cap = cfg.render.shade_cap_fraction
    if deferred and ev_slots > 0:
        shade_cap = min(float(ev_slots),
                        _round_cap(float(ev_frac.max()), margin, 0.01))
    import dataclasses as _dc
    cfg_t = _dc.replace(
        cfg, render=_dc.replace(cfg.render, query_cap_fraction=query_cap,
                                shade_cap_fraction=shade_cap))
    return cfg_t, DPCapReport(qfrac, ev_frac, live_frac, query_cap,
                              shade_cap)
