"""Benchmark: NRC render throughput (Mrays/s) on the live TPU chip.

Headline metric per BASELINE.json: Mrays/s at 1080p on the cloud_sixteenth
NRC workload. The reference publishes no numbers (SURVEY.md §6); baseline is
the BASELINE.json north-star target of 50 Mrays/s on a v5e-8, prorated to
the number of chips this run sees (6.25 Mrays/s per chip), so
vs_baseline >= 1.0 means the north star is met.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Env knobs: BENCH_WIDTH/BENCH_HEIGHT/BENCH_FRAMES/BENCH_SPP/BENCH_BAND,
BENCH_SAMPLER/BENCH_DELTA_*, BENCH_DIR_BUCKETS (collision-field direction
resolution A/B).
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np


_T0 = time.perf_counter()


def _t(msg: str) -> None:
    """Wall-clock phase marker on stderr (stdout stays the one JSON line).

    The driver only records stdout; these let a human (or a profiling run)
    see where the bench's wall time goes on the axon tunnel."""
    print(f"# t={time.perf_counter() - _T0:8.1f}s {msg}", file=sys.stderr,
          flush=True)


def _save_probes(path: str, key: str, probes: dict) -> None:
    """Merge this config's probe values into the probe cache file."""
    if os.environ.get("BENCH_PROBE_CACHE", "1") == "0":
        return
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            with open(path) as f:
                allp = json.load(f)
        except (OSError, ValueError):
            allp = {}
        allp[key] = {**allp.get(key, {}), **probes}
        with open(path, "w") as f:
            json.dump(allp, f)
    except OSError:
        pass


def main():
    import jax

    from neuralradiancecaching_tpu.utils import setup_cache
    setup_cache()

    from neuralradiancecaching_tpu import config as cfg_mod
    from neuralradiancecaching_tpu.io import assets
    from neuralradiancecaching_tpu.models import nrc
    from neuralradiancecaching_tpu.render import frame as frame_mod
    from neuralradiancecaching_tpu.render.tiled import (render_banded,
                                                        render_tiled)
    from neuralradiancecaching_tpu.scene.scene import make_scene

    width = int(os.environ.get("BENCH_WIDTH", 1920))
    height = int(os.environ.get("BENCH_HEIGHT", 1080))
    # 10 pipelined frames ~ 1.1 s of device time at the current record --
    # enough to amortize dispatch rampup and keep run-to-run noise < ~2%
    frames = int(os.environ.get("BENCH_FRAMES", 10))
    spp = int(os.environ.get("BENCH_SPP", 1))
    # banded rendering keeps per-band transients bounded; 0 = whole frame.
    # r1 sweep @1080p (scripts/profile_bands.py): 54-row bands beat
    # 108/216/540 (compaction argsorts were superlinear then). r5 re-A/B
    # under the PACKED pipeline (profile_live_tau.py): 30-row bands win --
    # the packed width is rounded UP to whole bands, so finer bands cut
    # real march/query lanes (518400 -> 460800 at the bench pose's 0.2188
    # cap; 105.9 -> 98.5 ms/frame, identical estimator).
    default_band = 30 if height % 30 == 0 else (
        54 if height % 54 == 0 else (108 if height % 108 == 0 else 0))
    band = int(os.environ.get("BENCH_BAND", default_band)) or None

    cfg = cfg_mod.progressive_1080p_config()
    cfg = dataclasses.replace(
        cfg,
        camera=dataclasses.replace(cfg.camera, aspect=width / height),
        render=dataclasses.replace(cfg.render, width=width, height=height,
                                   spp=spp, use_nn=True),
    )
    # BENCH_SAMPLER=delta benches the unbiased batched-Woodcock walk
    # (BENCH_DELTA_MAJORANT/BENCH_DELTA_STEPS tune it) for A/B against the
    # default collision field; the headline stays the shipped default
    sampler = os.environ.get("BENCH_SAMPLER")
    if sampler:
        cfg = dataclasses.replace(cfg, path=dataclasses.replace(
            cfg.path, sampler=sampler,
            delta_majorant=os.environ.get("BENCH_DELTA_MAJORANT", "local"),
            delta_null_steps=int(os.environ.get("BENCH_DELTA_STEPS", 16))))
    # BENCH_DIR_BUCKETS="32,64" A/Bs the collision-field direction
    # resolution (the shipped bias knob, VolumeConfig.field_dir_buckets:
    # 2x buckets halves the baked-field bias at 4x bake time with
    # UNCHANGED query row cost -- docs/PERFORMANCE.md bias localization)
    dir_buckets = os.environ.get("BENCH_DIR_BUCKETS")
    if dir_buckets:
        db = tuple(int(x) for x in dir_buckets.split(","))
        cfg = dataclasses.replace(cfg, volume=dataclasses.replace(
            cfg.volume, field_dir_buckets=db))
    # BENCH_LIVE_TAU A/Bs the live-mask entry-tau threshold (the row-count
    # lever: every lane whose baked entry tau falls below it drops to the
    # exact-at-threshold pure-env composite and saves its march + query +
    # shade rows; RenderConfig.live_tau_threshold). Set BEFORE the probe
    # key so cap probes re-run at the new mask.
    # r5 default 0.005 after a full quality A/B: 0.02 benched 26.33
    # Mrays/s but the GT legs CAUGHT its bias (ground_truth_rmse 0.0101 ->
    # 0.0128, nn_vs_oracle 0.0147 -- the luminance-weighted BOUND of
    # 3.2e-04 was honest about energy yet the dropped silhouette ring is
    # spatially structured, and rmse squares it). 0.005's bound is 6.5x
    # smaller and at the bench pose it drops no additional band (same
    # lane count as 1e-4 at 30-row bands), costing ~0 throughput here
    # while keeping the mask honest at other poses.
    # BENCH_LIVE_TAU=1e-4 restores the conservative r3 mask for the A/B.
    live_tau = os.environ.get("BENCH_LIVE_TAU", "0.005")
    if live_tau:
        cfg = dataclasses.replace(cfg, render=dataclasses.replace(
            cfg.render, live_tau_threshold=float(live_tau)))
    # BENCH_BLOB_BINS A/Bs the one-blob direction bin count (16 is the
    # reference's; fewer bins cut the query's transcendental VPU work and
    # the MLP input width at directional-resolution quality risk -- the
    # quality legs below are the gate). Changes the MLP architecture, so
    # it must be set before init_state.
    blob_bins = os.environ.get("BENCH_BLOB_BINS")
    if blob_bins:
        cfg = dataclasses.replace(cfg, oneblob=dataclasses.replace(
            cfg.oneblob, n_bins=int(blob_bins)))
    # slot-0 dense shade (RenderConfig.shade_slot0_dense): slot 0 is ~83%
    # live under the r5 pack, so it shades dense (contiguous slice, no
    # event-row gather, no segsum) and the pack covers only the tail
    # slots. BENCH_SLOT0_DENSE=0 restores the all-slots pack A/B leg.
    if os.environ.get("BENCH_SLOT0_DENSE", "1") != "0":
        cfg = dataclasses.replace(cfg, render=dataclasses.replace(
            cfg.render, shade_slot0_dense=True))

    density = assets.load_cloud()
    env_img = assets.load_env_map()
    scene = make_scene(cfg, density, env_img)
    _t('scene built (collision/tau/env fields baked)')

    state = nrc.init_state(jax.random.PRNGKey(cfg.seed), cfg)
    # a few online training steps so the cache is non-trivial
    train_steps = int(os.environ.get("BENCH_TRAIN_STEPS", 3))
    for i in range(train_steps):
        state, _ = frame_mod.train_only_step(state, scene,
                                             jax.random.PRNGKey(100 + i),
                                             cfg)
    np.asarray(state.hash_table.sum())
    _t('init train steps done')

    # auto-tune the query-compaction cap from a measured query fraction
    # (RenderConfig.query_cap_fraction): probe a band, round up generously
    from neuralradiancecaching_tpu.render import pathtrace
    from neuralradiancecaching_tpu.scene.camera import pixel_rays
    stride = max(1, (width * height) // (width * 64))
    ro, rd = pixel_rays(scene.camera, width, height)

    # probe-value cache (VERDICT r3 item 4): qfrac / live_frac / ev_mean
    # are deterministic given (camera pose, scene, sampler config) up to
    # sub-margin MC wiggle, and each probe costs a cold compile + an
    # eager-dispatch run over the tunnel. Key on the deterministic
    # repr(cfg) digest (hash(cfg) is salted per process) + probe keys.
    import hashlib
    probe_cache_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache",
        "bench_probes.json")
    probe_key = hashlib.sha1(
        f"{repr(cfg)}|99|98|{stride}".encode()).hexdigest()[:16]
    probes = {}
    if os.environ.get("BENCH_PROBE_CACHE", "1") != "0":
        try:
            with open(probe_cache_path) as f:
                probes = json.load(f).get(probe_key, {})
        except (OSError, ValueError):
            probes = {}
    if "qfrac" in probes:
        qfrac = probes["qfrac"]
    else:
        res = pathtrace.trace_path(scene, cfg, ro[::stride], rd[::stride],
                                   jax.random.PRNGKey(99), use_nn=True)
        # the cap is applied FRAME-GLOBALLY (queries deferred out of the
        # bands), so it only needs margin for frame-to-frame variation of
        # the mean fraction, not per-band skew
        qfrac = float(np.asarray((res.query_weight > 0).mean()))
    # 1/64 cap granularity: the query runs in 32k-row chunks anyway, so
    # coarse 1/16 rounding only over-provisions the pack gather (measured
    # 0.25 vs the needed 0.20 at the bench scene = ~3 extra 32k chunks)
    # 1.05x margin: the query count is a sum over 2M independent rays, so
    # its frame-to-frame relative sd is ~sqrt(1/(qfrac*n)) ~ 0.2% -- 5%
    # margin is hundreds of sds (drops would be deterministic + benign and
    # the bench's cap_bias A/B measures them: 0.0)
    cap = min(1.0, float(np.ceil((qfrac * 1.05 + 0.005) / 0.015625)
                         * 0.015625))
    # ... and the live-ray fraction from the FULL-FRAME entry-tau mask --
    # the mask is deterministic per camera pose (no RNG), so the probed
    # fraction is exact and any cap >= it is drop-free (ADVICE r2)
    from neuralradiancecaching_tpu.ops import lightfield, volume as vol_ops
    if "live_frac" in probes:
        live_frac = probes["live_frac"]
    else:
        entry_p, _, hit_m = vol_ops.entry_exit_points(ro, rd,
                                                      cfg.volume.box_size,
                                                      cfg.volume.box_center)
        tau0 = lightfield.query_tau_field(scene.env_t_field, entry_p, rd,
                                          cfg.volume)
        live_frac = float(np.asarray(
            (np.asarray(hit_m)
             & (np.asarray(tau0) > cfg.render.live_tau_threshold)).mean()))
    # NOTE: march_entry_fraction stays at its config default -- the measured
    # A/B found the entry-kill slower at 1080p (see PathTraceConfig); the
    # probe is reported for observability only.
    # ... and the deferred-shade event budget from the measured mean
    # scatter-event count per ray (same global-cap logic as the queries)
    ev_mean = 0.0
    shade_cap = cfg.render.shade_cap_fraction
    if pathtrace.shade_deferred(cfg):
        if "ev_mean" in probes and "k_slots" in probes:
            ev_mean, k_slots = probes["ev_mean"], probes["k_slots"]
            ev0_mean = probes.get("ev0_mean", 0.0)
        else:
            _, ev = pathtrace.trace_path_collision(
                scene, cfg, ro[::stride], rd[::stride],
                jax.random.PRNGKey(98), use_nn=True, collect_events=True)
            ev_mean = float(np.asarray((ev[..., 6] > 0).sum(axis=1).mean()))
            ev0_mean = float(np.asarray((ev[:, 0, 6] > 0).mean()))
            k_slots = float(ev.shape[1])
        # slot-0-dense shade (RenderConfig.shade_slot0_dense): the cap
        # budgets only the packed TAIL slots -- subtract the dense slot-0
        # mean from the probed total
        cap_mean = (ev_mean - ev0_mean if cfg.render.shade_slot0_dense
                    else ev_mean)
        shade_cap = min(k_slots,
                        float(np.ceil((cap_mean * 1.05 + 0.01) / 0.015625)
                              * 0.015625))
    if os.environ.get("BENCH_PROBE_CACHE", "1") != "0" and "qfrac" not in probes:
        probes.update(qfrac=qfrac, live_frac=live_frac)
        if pathtrace.shade_deferred(cfg):
            probes.update(ev_mean=ev_mean, k_slots=k_slots,
                          ev0_mean=ev0_mean)
        _save_probes(probe_cache_path, probe_key, probes)
    _t('cap probes done (cached)' if "qfrac" in probes else 'cap probes done')
    # frame-global live-ray packing: cap from the probed entry-live
    # fraction (measured A/B: pack 0.3125 vs off = 516 vs 549 ms @1080p).
    # The full-frame probe is exact for this camera pose, so a small
    # margin + the program's own round-up-to-whole-bands is drop-free.
    pack = 0.0
    if pathtrace.shade_deferred(cfg):
        pack = min(1.0, float(np.ceil((live_frac * 1.05 + 0.005) / 0.015625)
                              * 0.015625))
    # with the live-ray pack on, most PACKED lanes query (~69% at the
    # bench scene): the uncapped full-width chunked query (no
    # compact_select pack, no scatter_back, ZERO dropped queries) measures
    # faster than the capped+packed one (shade+query 89.8 -> 75.9 ms,
    # identical radiance sum; docs/PERFORMANCE.md), so the packed pipeline
    # queries uncapped. BENCH_QUERY_CAPPED=1 restores the capped path for
    # the A/B.
    if pack > 0.0 and os.environ.get("BENCH_QUERY_CAPPED") != "1":
        cap = 1.0
    # bf16 query compute (lerp weights + blob + MLP; index math stays
    # f32): 3.11 -> 2.86 ms per 32k chunk, output rel err mean 0.05% /
    # p99 0.25% -- far under the cache's own converged error.
    # BENCH_QUERY_DTYPE=float32 restores the f32 A/B leg.
    qdtype = os.environ.get("BENCH_QUERY_DTYPE", "bfloat16")
    if qdtype != cfg.mlp.inference_dtype:
        cfg = dataclasses.replace(
            cfg, mlp=dataclasses.replace(cfg.mlp, inference_dtype=qdtype))
    # BENCH_QUERY_CHUNK A/Bs the compacted-query lax.map chunk size (the
    # gather-op-count lever, RenderConfig.query_chunk): bigger chunks cut
    # the per-chunk 16-oct-level gather count proportionally, bounded by
    # the remote compile helper's program-size limit.
    qchunk = int(os.environ.get("BENCH_QUERY_CHUNK",
                                cfg.render.query_chunk))
    # BENCH_QUERY_SPLIT_MLP=0 restores the MLP-inside-the-chunk A/B leg
    # (RenderConfig.query_split_mlp)
    if os.environ.get("BENCH_QUERY_SPLIT_MLP") == "0":
        cfg = dataclasses.replace(cfg, render=dataclasses.replace(
            cfg.render, query_split_mlp=False))
    cfg = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render,
                                        query_cap_fraction=cap,
                                        shade_cap_fraction=shade_cap,
                                        live_pack_fraction=pack,
                                        query_chunk=qchunk))

    # whole frame as one program (lax.map over bands) when banding;
    # BENCH_HOST_TILED=1 falls back to the host-side band loop
    host_tiled = os.environ.get("BENCH_HOST_TILED") == "1"

    # hoisted per-camera/per-state constants: the direct-env composite
    # (static per camera pose) and the baked dense MRHE levels (static per
    # cache state; a training run re-bakes every N frames). Both are part
    # of render_banded when not supplied, so correctness paths are
    # unchanged -- this is the production progressive-frame shape.
    from neuralradiancecaching_tpu.render.tiled import (frame_env_color,
                                                        frame_live_pack)
    env_rgb = frame_env_color(scene, cfg)
    baked = nrc.bake(state, cfg)
    # ... and the live-ray pack itself (sel + packed rays): the live mask
    # is deterministic per pose, so the full-frame compact_select + ray
    # gathers move off the per-frame path too (frame_live_pack docstring).
    # BENCH_NO_PACK_HOIST=1 keeps the pack in-program for the A/B.
    live_pack = (frame_live_pack(scene, cfg, band)
                 if band and pack > 0.0
                 and os.environ.get("BENCH_NO_PACK_HOIST") != "1" else None)
    np.asarray(env_rgb.sum())
    _t('probes + hoists done (caps tuned, env/bake/pack hoisted)')

    def run(key, sync=True):
        if band and not host_tiled:
            img = render_banded(state, scene, key, cfg, band_rows=band,
                                env_rgb=env_rgb, baked=baked,
                                pack=live_pack)
        elif band:
            img = render_tiled(state, scene, key, cfg, band_rows=band)
        else:
            img = frame_mod.render_only_step(state, scene, key, cfg)
        # NOTE: block_until_ready does not reliably block on the axon
        # platform; a scalar device->host transfer is the hard sync.
        # The frame itself stays on device (the tunnel moves ~20 MB/s).
        if sync:
            np.asarray(img.sum())
        return img

    # warmup/compile; if the whole-frame banded program cannot be compiled
    # in this environment, fall back to the host-side band loop
    try:
        img = run(jax.random.PRNGKey(0))
    except Exception as e:
        if not band or host_tiled:
            raise
        print(f"# render_banded failed ({type(e).__name__}); "
              f"falling back to host-tiled", file=sys.stderr)
        host_tiled = True
        img = run(jax.random.PRNGKey(0))
    # pipelined frame loop: dispatches stay K frames ahead of the device
    # (reference: one command buffer submitted per frame without host
    # round-trips, NrcHpmRenderer.cpp:571-731). Device execution is
    # in-order, so syncing the last frame times the whole pipeline;
    # measured +6% vs per-frame hard syncs (scripts/profile_k_pipeline.py).
    _t('render warmup/compile done')
    t0 = time.perf_counter()
    for i in range(frames):
        img = run(jax.random.PRNGKey(1 + i), sync=(i == frames - 1))
    dt = time.perf_counter() - t0
    _t('timed render loop done')

    rays = width * height * spp * frames
    mrays_s = rays / dt / 1e6

    n_chips = max(len(jax.devices()), 1)
    baseline = 50.0 * n_chips / 8.0  # north-star prorated per chip

    result = {
        "metric": "nrc_render_throughput",
        "value": round(mrays_s, 4),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays_s / baseline, 4),
        "width": width,
        "height": height,
        "spp": spp,
        "frames": frames,
        "seconds": round(dt, 3),
        "devices": n_chips,
        "mean_radiance": float(np.asarray(img.mean())),
        "query_fraction": round(qfrac, 4),
        "query_cap": cap,
        "event_mean": round(ev_mean, 4),
        "shade_cap": shade_cap,
        "live_pack": pack,
        "entry_live_fraction": round(live_frac, 4),
    }

    # online-training throughput at reference-parity settings
    # (100x100 rays x 8 samples x 64 bounces; the reference trains EVERY
    # frame, NrcHpmRenderer.cpp:604)
    st2, mse = frame_mod.train_only_step(state, scene,  # warm/compile
                                         jax.random.PRNGKey(499), cfg)
    np.asarray(mse)
    t0 = time.perf_counter()
    ts = 10
    for i in range(ts):
        st2, mse = frame_mod.train_only_step(st2, scene,
                                             jax.random.PRNGKey(500 + i),
                                             cfg)
    # pipelined like the production loop: the steps chain through `st2`
    # so device execution is already serial; one hard sync at the end
    # avoids paying the ~25 ms axon tunnel round trip per step (see
    # docs/PERFORMANCE.md timing methodology)
    np.asarray(mse)
    train_dt = (time.perf_counter() - t0) / ts
    _t('train timing done')
    result["train_step_ms"] = round(train_dt * 1000, 1)
    result["train_steps_per_s"] = round(1.0 / train_dt, 2)

    # ONLINE frame as a unit (VERDICT r3 item 3): the cli.py progressive
    # loop's per-frame work -- train + re-bake (every N frames) + banded
    # render -- measured pipelined exactly like the production loop. The
    # reference trains every frame (src/main.cpp:181-246); amortized
    # training (--train-every, default 4 here) trades sub-frame cache
    # drift for frame rate, re-baking on the same cadence. Every program
    # here is already compiled above, so this phase costs ~one second.
    online_every = int(os.environ.get("BENCH_ONLINE_TRAIN_EVERY", 4))
    frames_o = int(os.environ.get("BENCH_ONLINE_FRAMES", 12))
    for every, tag in [(1, "online_fps_train_every_frame"),
                       (online_every, "online_fps")]:
        st3, baked3 = state, baked
        img_o = run(jax.random.PRNGKey(300))  # warm pipeline state
        t0 = time.perf_counter()
        for i in range(frames_o):
            if i % every == 0:
                st3, _ = frame_mod.train_only_step(
                    st3, scene, jax.random.PRNGKey(600 + i), cfg)
                baked3 = nrc.bake(st3, cfg)
            if band and not host_tiled:
                img_o = render_banded(st3, scene, jax.random.PRNGKey(700 + i),
                                      cfg, band_rows=band, env_rgb=env_rgb,
                                      baked=baked3, pack=live_pack)
            else:
                img_o = frame_mod.render_only_step(
                    st3, scene, jax.random.PRNGKey(700 + i), cfg)
        np.asarray(img_o.sum())
        dt_o = (time.perf_counter() - t0) / frames_o
        result[tag] = round(1.0 / dt_o, 2)
        if every != 1:
            result["online_frame_ms"] = round(dt_o * 1000, 1)
            result["online_train_every"] = every
    _t('online frame timing done')

    # MOVING-CAMERA frame (VERDICT r4 item 2): the reference's actual
    # regime is a fly/orbit camera re-rendering EVERY frame
    # (src/main.cpp:200-213, Input.cpp:50-98); every other number above
    # holds the pose fixed and hoists pose-static work out of the loop.
    # This leg orbits 1 deg/frame (32 px/frame pixel flow at 1080p/60deg
    # fov -- brisk interactive motion) and pays the REAL per-pose cost:
    # env composite + live pack + exact entry tau recomputed each frame,
    # train+bake on the same every-4 cadence as online_fps. The pack cap
    # is held at the bench pose's probed value (the orbit's live fraction
    # is pose-dependent; the cap is re-probed across the orbit below and
    # rounded up so the program shape never retraces mid-loop).
    if band and not host_tiled and pack > 0.0 \
            and os.environ.get("BENCH_MOVING", "1") != "0":
        from neuralradiancecaching_tpu.render.tiled import live_fraction
        from neuralradiancecaching_tpu.scene import camera as cam_mod

        def orbit_scene(i):
            mpos, mdir = cam_mod.orbit_position(i, 360, radius=64.0)
            return scene._replace(camera=cam_mod.make_camera(
                cfg.camera, position=mpos, view_dir=mdir))

        frames_m = int(os.environ.get("BENCH_MOVING_FRAMES", 10))
        # worst-pose pack cap over the loop's poses (cached probe): a cap
        # below any pose's live fraction would silently drop live rays
        if "moving_cap" in probes:
            pack_m_cap = probes["moving_cap"]
        else:
            worst = max(live_fraction(orbit_scene(i), cfg)
                        for i in range(0, frames_m, 3))
            # 1/64 rounding (was 1/16): the cap is probed ONCE and held
            # for the whole loop, so coarse rounding bought no shape
            # stability -- only padded lanes (0.25 vs 0.21875 at the r5
            # orbit = one extra 30-row band every frame)
            pack_m_cap = min(1.0, float(
                np.ceil((worst * 1.08 + 0.005) / 0.015625) * 0.015625))
            probes["moving_cap"] = pack_m_cap
            _save_probes(probe_cache_path, probe_key, probes)
        mcfg = dataclasses.replace(cfg, render=dataclasses.replace(
            cfg.render, live_pack_fraction=pack_m_cap))
        st4, baked4 = state, baked
        # warmup: compile the pose-hoist programs + the mcfg-cap render
        sc_w = orbit_scene(0)
        env_w = frame_env_color(sc_w, cfg)
        pk_w = frame_live_pack(sc_w, mcfg, band)
        img_m = render_banded(st4, sc_w, jax.random.PRNGKey(400), mcfg,
                              band_rows=band, env_rgb=env_w, baked=baked4,
                              pack=pk_w)
        np.asarray(img_m.sum())
        _t('moving-camera warmup/compile done')
        t0 = time.perf_counter()
        for i in range(frames_m):
            sc_i = orbit_scene(i + 1)
            env_i = frame_env_color(sc_i, cfg)
            pk_i = frame_live_pack(sc_i, mcfg, band)
            if i % online_every == 0:
                st4, _ = frame_mod.train_only_step(
                    st4, sc_i, jax.random.PRNGKey(800 + i), cfg)
                baked4 = nrc.bake(st4, cfg)
            img_m = render_banded(st4, sc_i, jax.random.PRNGKey(900 + i),
                                  mcfg, band_rows=band, env_rgb=env_i,
                                  baked=baked4, pack=pk_i)
        np.asarray(img_m.sum())
        dt_m = (time.perf_counter() - t0) / frames_m
        result["online_fps_moving"] = round(1.0 / dt_m, 2)
        result["moving_frame_ms"] = round(dt_m * 1000, 1)
        result["moving_pack_cap"] = pack_m_cap
        _t('moving-camera frame timing done')

    # spp=2 headline row (VERDICT r3 item 5): the SAME pipeline with two
    # virtual copies per ray (render_banded expands rays in-program; the
    # hoisted pose-static pack/env/bake all apply unchanged -- tiled.py
    # tiles them across copies). One extra compile, cached across runs.
    # Its bias leg lives in quality_metrics (relative_rmse_noise_sub_spp2).
    if (spp == 1 and band and not host_tiled
            and os.environ.get("BENCH_SPP2", "1") != "0"):
        cfg2 = dataclasses.replace(
            cfg, render=dataclasses.replace(cfg.render, spp=2))

        def run2(key, sync=True):
            img = render_banded(state, scene, key, cfg2, band_rows=band,
                                env_rgb=env_rgb, baked=baked,
                                pack=live_pack)
            if sync:
                np.asarray(img.sum())
            return img

        run2(jax.random.PRNGKey(0))
        _t('spp2 warmup/compile done')
        frames2 = max(4, frames // 2)
        t0 = time.perf_counter()
        for i in range(frames2):
            run2(jax.random.PRNGKey(1 + i), sync=(i == frames2 - 1))
        dt2 = time.perf_counter() - t0
        result["mrays_s_spp2"] = round(
            width * height * 2 * frames2 / dt2 / 1e6, 4)
        _t('spp2 timed loop done')

    if os.environ.get("BENCH_QUALITY", "1") != "0":
        result.update(quality_metrics(cfg, scene, state))

    print(json.dumps(result))


def _code_digest() -> str:
    """sha1 over the package's .py sources: twin-accumulation disk caches
    key on it so ANY code change invalidates every cached image (the cache
    can only ever replay a measurement the current code would reproduce
    bit-identically -- fixed keys, deterministic renders)."""
    import hashlib
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "neuralradiancecaching_tpu")
    h = hashlib.sha1()
    for dirpath, _, files in sorted(os.walk(root)):
        for fn in sorted(files):
            if fn.endswith(".py"):
                with open(os.path.join(dirpath, fn), "rb") as f:
                    h.update(f.read())
    return h.hexdigest()[:12]


def quality_metrics(cfg, scene, state):
    """North-star quality legs (VERDICT r4 items 1/7):

    * ``nn_vs_ground_truth_rmse_noise_sub`` -- THE north-star sentence,
      measured end-to-end: the NN render vs the fully unbiased oracle
      (delta sampler + ratio-tracked transmittance + MC in-scatter; the
      reference analogue is the no-cache path tracer,
      path-tracer.frag:38-40), twin-pair noise-subtracted, with a
      measured +-2 sigma interval (claim holds iff hi2s <= 0.01).
    * ``relative_rmse_noise_sub`` -- NN vs the same-sampler no-NN render
      (isolates the CACHE's image bias from the sampler's).
    * ``ground_truth_rmse_noise_sub`` -- no-NN shipped sampler vs the
      oracle (isolates the SAMPLER/shading-field bias).
    * spp=2 twins of the NN and ground-truth legs (the spp=2 throughput
      row's own quality numbers).
    * a moved-pose NN leg (one orbit step -- the bias number at the pose
      motion the moving-camera throughput rows sell).

    No-NN legs (reference twins, ground-truth twins, oracle twins) are
    state-independent and deterministic given (code, config, keys); they
    are cached on disk keyed on a digest of ALL package sources + the full
    config repr + keys (VERDICT r4 item 9), so steady-state bench runs pay
    only the NN legs. BENCH_TWIN_CACHE=0 disables.

    The cap A/B is EXACT: with in_scatter_mode='field' the shade phase
    draws no randomness, and the query/event caps change no RNG stream, so
    capped-vs-uncapped at the same key differ only by the deterministic
    drops."""
    import dataclasses
    import hashlib

    import jax

    from neuralradiancecaching_tpu.render import frame as frame_mod
    from neuralradiancecaching_tpu.utils.metrics import (
        noise_subtracted_bias_err, relative_rmse)

    qside = int(os.environ.get("BENCH_QUALITY_SIZE", 512))
    # 400: the cache-quality metric plateaus by ~400 steps (measured
    # trajectory in docs/PERFORMANCE.md); 150 measured pre-convergence
    train_steps = int(os.environ.get("BENCH_QUALITY_TRAIN", 400))
    spp_nn = int(os.environ.get("BENCH_QUALITY_SPP", 8))
    spp_ref = int(os.environ.get("BENCH_QUALITY_REF_SPP", 32))

    qcfg = dataclasses.replace(
        cfg,
        camera=dataclasses.replace(cfg.camera, aspect=1.0),
        render=dataclasses.replace(cfg.render, width=qside, height=qside,
                                   use_nn=True, query_cap_fraction=0.375),
    )
    st = state
    for i in range(train_steps):
        # train with the FULL-RES cfg, not qcfg: train_only_step consumes
        # only train/path/volume config + scene.camera (render size and
        # cfg.camera.aspect never reach the batch), and cfg's program is
        # already compiled from the bench's init-train loop -- qcfg was a
        # ~100 s duplicate compile of the most expensive program for a
        # bit-identical result (VERDICT r3 item 4)
        st, _ = frame_mod.train_only_step(st, scene,
                                          jax.random.PRNGKey(1000 + i),
                                          cfg)
    np.asarray(st.hash_table.sum())
    _t(f'quality: {train_steps} train steps done')

    def accum(c, spp_total, key0, sc=scene):
        acc = None
        for i in range(spp_total):
            img = frame_mod.render_only_step(st, sc,
                                             jax.random.PRNGKey(key0 + i), c)
            acc = img if acc is None else acc + img
        return np.asarray(acc / spp_total)

    code_dig = _code_digest()
    twin_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            ".jax_cache", "bench_twins")
    use_twin_cache = os.environ.get("BENCH_TWIN_CACHE", "1") != "0"

    def accum_cached(c, spp_total, key0, tag, sc=scene, pose="base"):
        """No-NN legs only: with use_nn=False the render never reads the
        trained state (the unused bake is DCE'd), so the accumulated image
        is deterministic given (code digest, config, pose, keys) -- safe
        to replay from disk across runs (VERDICT r4 item 9). The digest
        includes EVERY package source file, so any code change recomputes."""
        assert not c.render.use_nn
        if not use_twin_cache:
            return accum(c, spp_total, key0, sc)
        dig = hashlib.sha1(
            f"{code_dig}|{repr(c)}|{pose}|{spp_total}|{key0}".encode()
        ).hexdigest()[:16]
        path = os.path.join(twin_dir, f"{tag}_{dig}.npz")
        try:
            return np.load(path)["img"]
        except (OSError, ValueError, KeyError):
            pass
        img = accum(c, spp_total, key0, sc)
        try:
            os.makedirs(twin_dir, exist_ok=True)
            np.savez_compressed(path, img=img)
        except OSError:
            pass
        return img

    # Noise-controlled protocol (VERDICT r2 item 5): the raw NRC-vs-MC
    # image RMSE is dominated by the comparison's own MC noise at
    # affordable spp, so the <=1% north-star question is unanswerable from
    # it. Render TWIN PAIRS with disjoint key ranges: for images
    # A1,A2 ~ (bias + noise) and R1,R2 ~ noise,
    #   E mean((Abar-Rbar)^2) = bias^2 + (s_A^2 + s_R^2)/2
    # with s^2 estimated per-pixel from the twins (E mean((A1-A2)^2)
    # = 2 s_A^2), giving an unbiased bias^2 estimate after subtraction,
    # and a per-pixel standard error giving the +-2 sigma interval
    # (noise_subtracted_bias_err).
    img_nn = accum(qcfg, spp_nn, 2000)
    img_nn2 = accum(qcfg, spp_nn, 6000)
    _t('quality: NN twin accumulations done')
    ref_cfg = dataclasses.replace(
        qcfg, render=dataclasses.replace(qcfg.render, use_nn=False))
    img_ref = accum_cached(ref_cfg, spp_ref, 3000, "ref")
    img_ref2 = accum_cached(ref_cfg, spp_ref, 7000, "ref")
    _t('quality: reference twin accumulations done')
    rel = relative_rmse(img_nn, img_ref)

    bias_rel, floor_rel, _, bias_hi = noise_subtracted_bias_err(
        img_nn, img_nn2, img_ref, img_ref2)

    # spp=2 bias leg (VERDICT r3 item 5): the spp=2 throughput row's own
    # quality number. The per-sample estimator is identical -- spp only
    # averages iid samples, so the bias is mathematically the same -- but
    # the measured leg makes that claim falsifiable: NN twins rendered at
    # render.spp=2 (half the accumulation count = same total samples)
    # against the SAME reference twins. BENCH_QUALITY_SPP2=0 skips.
    spp2 = {}
    if os.environ.get("BENCH_QUALITY_SPP2", "1") != "0" and spp_nn >= 2:
        q2 = dataclasses.replace(
            qcfg, render=dataclasses.replace(qcfg.render, spp=2))
        s1 = accum(q2, spp_nn // 2, 2000)
        s2 = accum(q2, spp_nn // 2, 6000)
        b2, _, _, _ = noise_subtracted_bias_err(s1, s2, img_ref, img_ref2)
        spp2 = {"relative_rmse_noise_sub_spp2": round(b2, 5)}
        _t('quality: spp2 NN twin accumulations done')

    # MOVED-POSE legs (VERDICT r4 item 7): the NN-vs-reference bias under
    # pose motion, so the quality numbers cover what the moving-camera
    # throughput rows sell. Two regimes:
    #   * _moved: the cache trained ONLY at the bench pose, evaluated one
    #     orbit step (5.6 deg) away -- the STALE-CACHE TRANSIENT upper
    #     bound (a camera teleport with zero adaptation);
    #   * _tracked: the cache additionally trained ALONG the trailing
    #     orbit at the moving-bench cadence (1 deg/frame, train-every-4 =
    #     one train step per 4 deg of orbit), evaluated at the pose the
    #     trajectory arrives at -- the steady-tracking regime of the
    #     online_fps_moving loop.
    # Pose-static machinery (env/pack/entry-tau hoists) is not involved
    # here -- render_only_step recomputes everything per pose -- so these
    # measure the estimator at moving cameras, not the hoist logic.
    moved = {}
    if os.environ.get("BENCH_QUALITY_MOVED", "1") != "0":
        from neuralradiancecaching_tpu.scene import camera as cam_mod

        def orbit_scene(frame, n):
            mpos, mdir = cam_mod.orbit_position(frame, n, radius=64.0)
            return scene._replace(camera=cam_mod.make_camera(
                qcfg.camera, position=mpos, view_dir=mdir))

        scene_m = orbit_scene(1, 64)
        m1 = accum(qcfg, spp_nn, 2000, scene_m)
        m2 = accum(qcfg, spp_nn, 6000, scene_m)
        mr1 = accum_cached(ref_cfg, spp_ref, 3000, "ref", scene_m, "orbit1")
        mr2 = accum_cached(ref_cfg, spp_ref, 7000, "ref", scene_m, "orbit1")
        mb, mf, _, _ = noise_subtracted_bias_err(m1, m2, mr1, mr2)
        moved = {"relative_rmse_noise_sub_moved": round(mb, 5),
                 "noise_floor_rel_moved": round(mf, 5)}
        _t('quality: moved-pose (stale) twin accumulations done')

        track_steps = int(os.environ.get("BENCH_QUALITY_TRACK_STEPS", 96))
        if track_steps > 0:
            st_save = st
            # one train step per 4 deg of orbit (n=90), arriving at pose
            # track_steps; same compiled train program (scene is an arg)
            for i in range(track_steps):
                st, _ = frame_mod.train_only_step(
                    st, orbit_scene(i, 90), jax.random.PRNGKey(40000 + i),
                    cfg)
            scene_t = orbit_scene(track_steps, 90)
            t1 = accum(qcfg, spp_nn, 2000, scene_t)
            t2 = accum(qcfg, spp_nn, 6000, scene_t)
            tr1 = accum_cached(ref_cfg, spp_ref, 3000, "ref", scene_t,
                               f"track{track_steps}")
            tr2 = accum_cached(ref_cfg, spp_ref, 7000, "ref", scene_t,
                               f"track{track_steps}")
            tb, tf, _, _ = noise_subtracted_bias_err(t1, t2, tr1, tr2)
            moved["relative_rmse_noise_sub_tracked"] = round(tb, 5)
            moved["noise_floor_rel_tracked"] = round(tf, 5)
            st = st_save  # downstream legs keep the bench-pose cache
            _t('quality: tracked-pose twin accumulations done')

    # GROUND-TRUTH legs (VERDICT r4 item 1): against the FULLY UNBIASED
    # oracle -- delta sampler + ratio-tracked transmittance + MC
    # in-scatter (the repo's own ground truth; the reference analogue is
    # the no-cache path tracer, path-tracer.frag:38-40):
    #   * nn_vs_ground_truth_*: the NN render vs the oracle -- the literal
    #     north-star sentence, measured end-to-end (the cache trains on
    #     row-tau targets, so this is NOT derivable from the other legs);
    #   * ground_truth_*: the shipped no-NN render vs the oracle (sampler
    #     + shading-field bias in isolation).
    # gt_spp default 64 (r4 ran 16): the subtracted noise floor enters the
    # bias estimate quadratically, so 4x spp cuts its contamination 4x;
    # the oracle twins are state-independent and disk-cached. Run at 256^2
    # (at fixed sample budget, fewer pixels at more spp minimizes the
    # estimator's standard error -- it scales as floor^2/sqrt(N) with
    # floor^2 ~ 1/spp and cost ~ spp*N).
    gt = {}
    if os.environ.get("BENCH_QUALITY_GT", "1") != "0":
        gt_spp = int(os.environ.get("BENCH_QUALITY_GT_SPP", 64))
        gt_side = int(os.environ.get("BENCH_QUALITY_GT_SIZE", 256))
        gcfg = dataclasses.replace(
            qcfg, render=dataclasses.replace(qcfg.render, width=gt_side,
                                             height=gt_side, use_nn=False))
        ocfg = dataclasses.replace(
            gcfg,
            path=dataclasses.replace(gcfg.path, sampler="delta",
                                     transmittance_mode="ratio"),
            env_map=dataclasses.replace(gcfg.env_map, in_scatter_mode="mc",
                                        transmittance_mode="ratio"))
        o1 = accum_cached(ocfg, 2 * gt_spp, 21000, "oracle")
        o2 = accum_cached(ocfg, 2 * gt_spp, 25000, "oracle")
        _t('quality: oracle twin accumulations done')
        g1 = accum_cached(gcfg, gt_spp, 20000, "gt")
        g2 = accum_cached(gcfg, gt_spp, 24000, "gt")
        gt_bias, gt_floor, _, gt_hi = noise_subtracted_bias_err(g1, g2,
                                                                o1, o2)
        om = (o1 + o2).mean() / 2
        # THE north-star number: NN render twins vs the oracle twins
        ncfg = dataclasses.replace(
            gcfg, render=dataclasses.replace(gcfg.render, use_nn=True))
        n1 = accum(ncfg, gt_spp, 20000)
        n2 = accum(ncfg, gt_spp, 24000)
        nn_bias, nn_floor, _, nn_hi = noise_subtracted_bias_err(n1, n2,
                                                                o1, o2)
        _t('quality: NN-vs-oracle twin accumulations done')
        gt = {
            "nn_vs_ground_truth_rmse_noise_sub": round(nn_bias, 5),
            "nn_vs_ground_truth_hi2s": round(nn_hi, 5),
            "nn_vs_ground_truth_noise_floor": round(nn_floor, 5),
            "nn_vs_ground_truth_mean_delta": round(
                float((n1 + n2).mean() / 2 - om) / max(float(om), 1e-9), 5),
            "ground_truth_rmse_noise_sub": round(gt_bias, 5),
            "ground_truth_hi2s": round(gt_hi, 5),
            "ground_truth_noise_floor": round(gt_floor, 5),
            "ground_truth_mean_delta": round(
                float((g1 + g2).mean() / 2 - om) / max(float(om), 1e-9), 5),
            "ground_truth_spp": gt_spp,
        }
        # spp=2 GT legs (VERDICT r4 item 7: per-leg symmetry): the shipped
        # spp=2 render (no-NN and NN) vs the same oracle twins, same total
        # sample budget. Distinct key ranges -- an spp=2 program's stream
        # at key k need not be independent of the spp=1 program's at k.
        if os.environ.get("BENCH_QUALITY_SPP2", "1") != "0" and gt_spp >= 2:
            g2cfg = dataclasses.replace(
                gcfg, render=dataclasses.replace(gcfg.render, spp=2))
            gs1 = accum_cached(g2cfg, gt_spp // 2, 30000, "gt2")
            gs2 = accum_cached(g2cfg, gt_spp // 2, 34000, "gt2")
            gb2, _, _, _ = noise_subtracted_bias_err(gs1, gs2, o1, o2)
            n2cfg = dataclasses.replace(
                ncfg, render=dataclasses.replace(ncfg.render, spp=2))
            ns1 = accum(n2cfg, gt_spp // 2, 30000)
            ns2 = accum(n2cfg, gt_spp // 2, 34000)
            nb2, _, _, _ = noise_subtracted_bias_err(ns1, ns2, o1, o2)
            gt["ground_truth_rmse_noise_sub_spp2"] = round(gb2, 5)
            gt["nn_vs_ground_truth_rmse_noise_sub_spp2"] = round(nb2, 5)
            _t('quality: spp2 GT twin accumulations done')

    # cap bias A/B (same single key; shading deterministic in field mode)
    uncapped = dataclasses.replace(
        qcfg,
        render=dataclasses.replace(qcfg.render, query_cap_fraction=1.0),
        path=dataclasses.replace(qcfg.path, compact_events=0.0))
    a = np.asarray(frame_mod.render_only_step(st, scene,
                                              jax.random.PRNGKey(7777),
                                              qcfg))
    b = np.asarray(frame_mod.render_only_step(st, scene,
                                              jax.random.PRNGKey(7777),
                                              uncapped))
    _t('quality: cap-bias A/B done')
    out = {
        "relative_rmse": round(float(rel), 5),
        # noise-subtracted NN-vs-same-sampler image bias (cache bias in
        # isolation) and the comparison's own noise floor; the north-star
        # number itself is nn_vs_ground_truth_rmse_noise_sub above
        "relative_rmse_noise_sub": round(bias_rel, 5),
        "relative_rmse_noise_sub_hi2s": round(bias_hi, 5),
        "noise_floor_rel": round(floor_rel, 5),
        "quality_size": qside,
        "quality_train_steps": train_steps,
        "cap_bias_rmse": round(float(relative_rmse(a, b)), 6),
        "cap_bias_mean_delta": round(float(a.mean() - b.mean())
                                     / max(float(b.mean()), 1e-9), 6),
        **spp2,
        **moved,
        **gt,
    }
    if qcfg.path.sampler in ("collision", "delta"):
        out.update(cache_quality(qcfg, scene, st))
        # CADENCE leg (VERDICT r4 item 6): the online loop trains every 4th
        # frame while the camera orbits 1 deg/frame (the online_fps_moving
        # regime) -- every number above trains EVERY step at a fixed pose.
        # Rendering never mutates state, so the cadence loop's state is
        # exactly "one train step per 4 deg of orbit motion"; the probe
        # then measures the drifting cache's binned error AT the arrival
        # pose. Gap vs cache_rel_err_binned = the cost of amortized
        # training under motion.
        if os.environ.get("BENCH_QUALITY_CADENCE", "1") != "0":
            from neuralradiancecaching_tpu.scene import camera as cam_mod

            def orbit_pose(frame):
                mpos, mdir = cam_mod.orbit_position(frame, 360, radius=64.0)
                return scene._replace(camera=cam_mod.make_camera(
                    qcfg.camera, position=mpos, view_dir=mdir))

            every = int(os.environ.get("BENCH_ONLINE_TRAIN_EVERY", 4))
            st_c = st
            n_frames = int(os.environ.get("BENCH_QUALITY_CADENCE_FRAMES",
                                          32))
            for i in range(n_frames):
                if i % every == 0:
                    st_c, _ = frame_mod.train_only_step(
                        st_c, orbit_pose(i), jax.random.PRNGKey(50000 + i),
                        cfg)
            cq = cache_quality(qcfg, orbit_pose(n_frames), st_c)
            out["cadence_cache_err"] = cq["cache_rel_err_binned"]
            out["cadence_train_every"] = every
            _t('quality: cadence cache probe done')
    return out


def cache_quality(qcfg, scene, st, n_points=8192, samples=32, bins=16):
    """CONVERGED cache-quality probe: the trained cache's prediction vs a
    high-sample MC estimate of the SAME quantity S(x, d_in) at real render
    query points, compared as means over spatial/directional bins so the
    per-point MC noise averages out (the image-level relative_rmse is
    noise-dominated at affordable spp; this is the driver-visible converged
    number the north star's <=1% asks about).
    """
    import jax
    import jax.numpy as jnp

    from neuralradiancecaching_tpu.models import nrc
    from neuralradiancecaching_tpu.ops import compact
    from neuralradiancecaching_tpu.render import pathtrace, targets
    from neuralradiancecaching_tpu.scene.camera import pixel_rays

    # separate jits with scene/state passed as ARGUMENTS (a closed-over
    # scene embeds the 250 MB collision field as an HLO constant and blows
    # the remote compile helper's request-size limit); one fused program
    # is too large regardless
    @jax.jit
    def probe_points(sc, key):
        ro, rd = pixel_rays(sc.camera, qcfg.render.width,
                            qcfg.render.height)
        res = pathtrace.trace_path(sc, qcfg, ro, rd, key, use_nn=True)
        # uniform spatial sample: stable compaction would take the FIRST
        # n_points queries in pixel order (top of frame only)
        perm = jax.random.permutation(jax.random.fold_in(key, 1),
                                      ro.shape[0])
        mask_p = jnp.take(res.query_weight > 0.0, perm)
        sel_p, val = compact.compact_select(mask_p, n_points)
        sel = jnp.take(perm, sel_p)
        return (jnp.take(res.query_pos, sel, axis=0),
                jnp.take(res.query_dir, sel, axis=0), val)

    one_chunk = jax.jit(
        lambda sc, p, dd, k: targets.cache_targets_collision(
            sc, qcfg, p, dd, k, samples=samples))

    def mc_targets(sc, pos, d, key):
        chunk = 2048
        pc = pos.reshape(-1, chunk, 3)
        dc = d.reshape(-1, chunk, 3)
        ks = jax.random.split(key, pc.shape[0])
        return jnp.concatenate(
            [one_chunk(sc, pc[i], dc[i], ks[i])
             for i in range(pc.shape[0])])

    @jax.jit
    def pred_and_bin(st, pos, d, val, target):
        baked = nrc.bake(st, qcfg)
        pred = nrc.query_baked(st, baked, pos, d, qcfg)
        # bin by position octant (3 bits) + direction z sign (1 bit)
        ctr = jnp.asarray(qcfg.volume.box_center)
        bits = ((pos > ctr).astype(jnp.int32)
                * jnp.asarray([1, 2, 4])).sum(-1)
        bin_id = jnp.where(val, bits + 8 * (d[:, 2] > 0), bins)
        t_bin = jax.ops.segment_sum(jnp.where(val[:, None], target, 0.0),
                                    bin_id, num_segments=bins + 1)[:bins]
        p_bin = jax.ops.segment_sum(jnp.where(val[:, None], pred, 0.0),
                                    bin_id, num_segments=bins + 1)[:bins]
        cnt = jax.ops.segment_sum(val.astype(jnp.float32), bin_id,
                                  num_segments=bins + 1)[:bins]
        return t_bin, p_bin, cnt

    pos, d, val = probe_points(scene, jax.random.PRNGKey(11))
    target = mc_targets(scene, pos, d, jax.random.PRNGKey(12))
    t_bin, p_bin, cnt = pred_and_bin(st, pos, d, val, target)
    keep = np.asarray(cnt) >= 64  # bins with enough samples to converge
    t_m = np.asarray(t_bin)[keep] / np.asarray(cnt)[keep][:, None]
    p_m = np.asarray(p_bin)[keep] / np.asarray(cnt)[keep][:, None]
    if not keep.any():
        # tiny probes (or low-query samplers at tiny sizes) can leave every
        # bin under-occupied; emit null, never NaN, in the driver JSON
        return {"cache_rel_err_binned": None, "cache_bins_used": 0,
                "cache_probe_points": int(np.asarray(val.sum()))}
    rel = float(np.sqrt(np.mean((p_m - t_m) ** 2))
                / max(np.sqrt(np.mean(t_m ** 2)), 1e-9))
    return {
        "cache_rel_err_binned": round(rel, 5),
        "cache_bins_used": int(keep.sum()),
        "cache_probe_points": int(np.asarray(val.sum())),
    }


def _backend_preflight(attempts: int = 3, timeout_s: int = 240) -> bool:
    """Probe the TPU backend in a KILLABLE subprocess: when the axon
    tunnel is down, backend init HANGS (not raises), which would otherwise
    eat the driver's whole bench timeout. Waits ~3 min between attempts
    to ride out short flaps."""
    import subprocess
    for attempt in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; assert len(jax.devices()) >= 1"],
                timeout=timeout_s, capture_output=True)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        print(f"# TPU backend preflight failed (attempt {attempt + 1}/"
              f"{attempts})", file=sys.stderr)
        if attempt < attempts - 1:
            time.sleep(180)
    return False


if __name__ == "__main__":
    child = os.environ.get("BENCH_NO_RETRY") == "1"
    if not child and not _backend_preflight():
        print(json.dumps({
            "metric": "nrc_render_throughput", "value": 0.0,
            "unit": "Mrays/s", "vs_baseline": 0.0,
            "error": "TPU backend unavailable (preflight probe hung/failed"
                     "; axon tunnel down)",
        }))
        sys.exit(0)
    try:
        main()
        sys.exit(0)
    except Exception as e:
        import traceback
        traceback.print_exc(file=sys.stderr)
        err = e
    if child:
        # retry child: exit NONZERO without a JSON line so the parent's
        # remaining spaced retries stay reachable (the parent prints the
        # final JSON if every attempt fails)
        sys.exit(1)
    # the axon tunnel occasionally flaps (backend init raises UNAVAILABLE);
    # a backend-init failure is worth spaced retries in a FRESH subprocess
    # (failed backend state sticks to the process) before conceding 0.0.
    # Each child is preflighted (killable) first so a hang cannot eat the
    # driver's timeout, and bounded by a hard subprocess timeout.
    transient = ("initialize backend" in str(err)
                 or "UNAVAILABLE" in str(err))
    if transient:
        import subprocess
        for attempt in range(2):
            time.sleep(180)
            if not _backend_preflight(attempts=1):
                continue
            print(f"# backend recovered; bench retry {attempt + 1} in a "
                  f"fresh process", file=sys.stderr)
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__)],
                    env={**os.environ, "BENCH_NO_RETRY": "1"},
                    timeout=3000)
                if r.returncode == 0:
                    sys.exit(0)  # the child printed the JSON line
            except subprocess.TimeoutExpired:
                pass
    # never leave the driver without a JSON line
    print(json.dumps({
        "metric": "nrc_render_throughput", "value": 0.0,
        "unit": "Mrays/s", "vs_baseline": 0.0,
        "error": f"{type(err).__name__}: {err}"[:500],
    }))
    sys.exit(0)
