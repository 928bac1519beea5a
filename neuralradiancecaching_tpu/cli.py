"""Command-line entry points -- the reference's `RunNrcHpm` main loop
(src/main.cpp:109-284) split into one headless subcommand per BASELINE.json
workload, with EXR/PNG output replacing swapchain presentation and JSONL
metrics replacing the ImGui panel.

  python -m neuralradiancecaching_tpu.cli mnist
  python -m neuralradiancecaching_tpu.cli image-fit --steps 500
  python -m neuralradiancecaching_tpu.cli pathtrace --width 256 --out out
  python -m neuralradiancecaching_tpu.cli nrc-online --frames 8 --out out
  python -m neuralradiancecaching_tpu.cli progressive --frames 4 --out out
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time

import numpy as np


def _common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="out")
    p.add_argument("--metrics", type=str, default=None,
                   help="JSONL metrics path")


def _save_frame(out_dir: str, name: str, image: np.ndarray) -> None:
    from neuralradiancecaching_tpu.io import exr
    os.makedirs(out_dir, exist_ok=True)
    exr.write_exr(os.path.join(out_dir, name + ".exr"), image)
    exr.write_png(os.path.join(out_dir, name + ".png"), exr.tonemap(image))


def cmd_mnist(args) -> None:
    from neuralradiancecaching_tpu import config as cfg_mod
    from neuralradiancecaching_tpu.io import assets
    from neuralradiancecaching_tpu.models import mnist_mlp
    from neuralradiancecaching_tpu.utils.metrics import MetricsLogger

    cfg = cfg_mod.mnist_config()
    x, y = assets.load_mnist("train", limit=args.limit)
    log = MetricsLogger(args.metrics)
    state, loss, acc = mnist_mlp.train(x, y, cfg.mlp, cfg.mlp_opt,
                                       steps=args.steps, seed=args.seed)
    xt, yt = assets.load_mnist("test", limit=2048)
    import jax.numpy as jnp
    _, test_acc = mnist_mlp.loss_fn(state.params, jnp.asarray(xt),
                                    jnp.asarray(yt), cfg.mlp)
    log.log(args.steps, train_loss=loss, train_acc=acc,
            test_acc=float(test_acc))
    print(f"mnist: loss={loss:.4f} acc={acc:.3f} test_acc={float(test_acc):.3f}")


def cmd_image_fit(args) -> None:
    from neuralradiancecaching_tpu.io import assets, exr
    from neuralradiancecaching_tpu.models import image_fit
    import jax.numpy as jnp

    img = assets.load_env_map()
    state, psnr_db = image_fit.fit_image(jnp.asarray(img), steps=args.steps,
                                         seed=args.seed)
    print(f"image-fit: psnr={psnr_db:.2f} dB over {args.steps} steps")
    if args.out:
        mrhe_cfg, mlp_cfg, _ = image_fit.default_configs()
        h, w = img.shape[:2]
        ys, xs = np.meshgrid(np.arange(h) / h, np.arange(w) / w,
                             indexing="ij")
        uv = jnp.asarray(np.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1),
                         jnp.float32)
        pred = np.asarray(image_fit.predict(state, uv, mrhe_cfg, mlp_cfg))
        _save_frame(args.out, "image_fit", pred.reshape(h, w, 3))


def _build_scene(cfg):
    from neuralradiancecaching_tpu.io import assets
    from neuralradiancecaching_tpu.scene.scene import make_scene
    return make_scene(cfg, assets.load_cloud(), assets.load_env_map())


def _band_rows(width: int, height: int, n_dev: int = 1) -> int | None:
    """Band height for tiled rendering of large frames. 30-row bands
    measured fastest at 1080p under the packed pipeline (r5,
    scripts/profile_live_tau.py: the packed width rounds UP to whole
    bands, so finer bands cut real march/query lanes -- 105.9 -> 98.5
    ms/frame vs 54 rows; the r1 54-row optimum predates the pack).

    With a mesh, dp_render_banded stripes whole bands across devices and
    requires height % (n_dev * rows) == 0 -- candidates are filtered
    accordingly (1080p/8 devices -> 27-row bands; 800px/8 -> 25)."""
    if width * height <= 512 * 512:
        return None
    for rows in (30, 54, 108, 64, 32, 27, 25, 20, 16, 10, 9, 8, 5, 4, 3,
                 2, 1):
        if height % (n_dev * rows) == 0:
            return rows
    return None


def _mesh_from_arg(mesh_arg):
    """--mesh off|auto|N -> a jax.sharding.Mesh (or None when off).

    'auto' takes every visible device, so the same command runs unmodified
    on today's single chip and on a v5e-8 (the DP layer reshards rays and
    pixels; parallel/data_parallel.py)."""
    if not mesh_arg or mesh_arg == "off":
        return None
    import jax

    from neuralradiancecaching_tpu.parallel import make_mesh
    n = len(jax.devices()) if mesh_arg == "auto" else int(mesh_arg)
    return make_mesh(n)


def _render_frame(state, scene, key, cfg):
    """Render one frame, banded when large. Returns np (H, W, 3)."""
    import jax
    from neuralradiancecaching_tpu.render import frame as frame_mod
    from neuralradiancecaching_tpu.render.tiled import render_banded
    band = _band_rows(cfg.render.width, cfg.render.height)
    if band:
        # one jitted program per frame (lax.map over row bands) -- the
        # reference's single command buffer at production sizes
        return np.asarray(render_banded(state, scene, key, cfg,
                                        band_rows=band))
    img = frame_mod.render_only_step(state, scene, key, cfg)
    return np.asarray(img)


def cmd_pathtrace(args) -> None:
    import jax
    from neuralradiancecaching_tpu import config as cfg_mod
    from neuralradiancecaching_tpu.models import nrc
    from neuralradiancecaching_tpu.render import frame as frame_mod

    cfg = cfg_mod.pathtrace_config(args.width, args.height, args.spp)
    cfg = dataclasses.replace(cfg, camera=dataclasses.replace(
        cfg.camera, aspect=args.width / args.height))
    if args.sampler != cfg.path.sampler:
        # 'collision' = baked-field perf sampler; 'delta' = unbiased
        # Woodcock ground truth; 'reference' = the upstream march
        cfg = dataclasses.replace(cfg, path=dataclasses.replace(
            cfg.path, sampler=args.sampler))
    scene = _build_scene(cfg)
    state = nrc.init_state(jax.random.PRNGKey(args.seed), cfg)
    t0 = time.perf_counter()
    img = _render_frame(state, scene, jax.random.PRNGKey(args.seed), cfg)
    print(f"pathtrace: {args.width}x{args.height} spp={args.spp} "
          f"{time.perf_counter() - t0:.2f}s mean={img.mean():.4f}")
    _save_frame(args.out, "pathtrace", img)


def cmd_nrc_online(args) -> None:
    import jax
    from neuralradiancecaching_tpu import config as cfg_mod
    from neuralradiancecaching_tpu.io import checkpoint
    from neuralradiancecaching_tpu.models import nrc
    from neuralradiancecaching_tpu.render import frame as frame_mod
    from neuralradiancecaching_tpu.utils.metrics import MetricsLogger

    cfg = cfg_mod.nrc_online_config(args.width, args.height)
    cfg = dataclasses.replace(cfg, camera=dataclasses.replace(
        cfg.camera, aspect=args.width / args.height))
    cfg_base = cfg  # pre-override config: what a default-run checkpoint
    # was saved under (the natural parity flow trains with the default
    # sampler and resumes with --sampler delta)
    if getattr(args, "sampler", None) and args.sampler != cfg.path.sampler:
        cfg = dataclasses.replace(cfg, path=dataclasses.replace(
            cfg.path, sampler=args.sampler))
    scene = _build_scene(cfg)
    state = nrc.init_state(jax.random.PRNGKey(args.seed), cfg)
    if args.resume:
        try:
            state = checkpoint.load(
                args.resume, state,
                expect_config_hash=checkpoint.config_hash(cfg))
        except ValueError:
            if cfg is cfg_base:
                raise
            # accept checkpoints trained under the pre-override sampler
            state = checkpoint.load(
                args.resume, state,
                expect_config_hash=checkpoint.config_hash(cfg_base))
            print(f"note: checkpoint config matches the default sampler; "
                  f"evaluating under --sampler {args.sampler}")
        print(f"resumed from {args.resume}")

    log = MetricsLogger(args.metrics)
    img = None
    mesh = _mesh_from_arg(getattr(args, "mesh", None))
    n_dev = mesh.devices.size if mesh is not None else 1
    band = _band_rows(args.width, args.height, n_dev)
    big = band is not None
    for i in range(args.frames):
        t0 = time.perf_counter()
        key = jax.random.PRNGKey(args.seed * 7919 + i)
        if mesh is not None and big:
            from neuralradiancecaching_tpu.parallel import (
                dp_train_banded_frame)
            state, out_img, mse, _ = dp_train_banded_frame(
                state, scene, key, cfg, mesh, band_rows=band)
            img = np.asarray(out_img)
            out_mse = float(np.asarray(mse))
        elif mesh is not None:
            from neuralradiancecaching_tpu.parallel import dp_frame_step
            state, out_img, mse = dp_frame_step(state, scene, key, cfg,
                                                mesh)
            img = np.asarray(out_img)
            out_mse = float(np.asarray(mse))
        elif big:
            # large frames: separate train pass + banded render (one huge
            # fused frame program can crash the remote compile helper)
            k1, k2 = jax.random.split(key)
            state, mse = frame_mod.train_only_step(state, scene, k1, cfg)
            img = _render_frame(state, scene, k2, cfg)
            out_mse = float(np.asarray(mse))
        else:
            state, out = frame_mod.frame_step(state, scene, key, cfg)
            img = np.asarray(out.image)
            out_mse = float(out.mse)
        dt = time.perf_counter() - t0
        row = log.log(i, mse=out_mse, frame_s=round(dt, 3),
                      mrays_s=round(args.width * args.height / dt / 1e6, 4))
        # reference logs MSE every 25 frames (src/main.cpp:220-224)
        if i % max(args.frames // 8, 1) == 0 or i == args.frames - 1:
            print(f"frame {i}: mse={row['mse']:.5f} {row['frame_s']}s")
    if img is not None:
        _save_frame(args.out, "nrc_online", img)
    if args.checkpoint:
        checkpoint.save(args.checkpoint, state,
                        metadata={"frames": args.frames, "seed": args.seed,
                                  "config_hash": checkpoint.config_hash(cfg)})
        print(f"checkpoint -> {args.checkpoint}")


def cmd_progressive(args) -> None:
    """Config 5: progressive accumulation along a camera fly-through."""
    import jax
    import jax.numpy as jnp
    from neuralradiancecaching_tpu import config as cfg_mod
    from neuralradiancecaching_tpu.io import assets
    from neuralradiancecaching_tpu.models import nrc
    from neuralradiancecaching_tpu.render import frame as frame_mod
    from neuralradiancecaching_tpu.scene import camera as cam_mod
    from neuralradiancecaching_tpu.scene.scene import make_scene
    from neuralradiancecaching_tpu.utils.metrics import MetricsLogger

    cfg = cfg_mod.progressive_1080p_config()
    cfg = dataclasses.replace(
        cfg,
        camera=dataclasses.replace(cfg.camera,
                                   aspect=args.width / args.height),
        render=dataclasses.replace(cfg.render, width=args.width,
                                   height=args.height))
    if getattr(args, "sampler", None) and args.sampler != cfg.path.sampler:
        cfg = dataclasses.replace(cfg, path=dataclasses.replace(
            cfg.path, sampler=args.sampler))
    scene = make_scene(cfg, assets.load_cloud(), assets.load_env_map())
    state = nrc.init_state(jax.random.PRNGKey(args.seed), cfg)
    log = MetricsLogger(args.metrics)

    # camera moves every `move_every` frames; progressive 1-spp accumulation
    # resets on movement (matching interactive progressive rendering).
    # Production shape: accumulation stays ON DEVICE (one 24 MB transfer at
    # save time, not per frame), the direct-env composite is hoisted per
    # camera pose, the dense MRHE bake re-runs every --bake-every frames
    # (cache drift per frame is tiny at production lr), and the host
    # dispatches run PIPELINED -- one hard sync per --sync-every frames
    # (measured +6%; device execution is in-order).
    from neuralradiancecaching_tpu.models import nrc as nrc_mod
    from neuralradiancecaching_tpu.render.tiled import (frame_env_color,
                                                        frame_live_pack,
                                                        live_fraction)

    mesh = _mesh_from_arg(getattr(args, "mesh", None))
    n_dev = mesh.devices.size if mesh is not None else 1
    band = (args.band_rows if getattr(args, "band_rows", 0)
            else _band_rows(args.width, args.height, n_dev))
    if band:
        assert args.height % (n_dev * band) == 0, (args.height, n_dev, band)
    banded = band is not None
    accum = jnp.zeros((args.height, args.width, 3), jnp.float32)
    n_accum = 0
    env_rgb = baked = live_pack = None
    win_t0, win_i = time.perf_counter(), 0
    for i in range(args.frames):
        cam_step = i // args.move_every
        if i % args.move_every == 0:
            pos, vdir = cam_mod.orbit_position(
                cam_step, max(args.frames // args.move_every, 1) * 4,
                radius=64.0)
            camera = cam_mod.make_camera(cfg.camera, position=pos,
                                         view_dir=vdir)
            scene = scene._replace(camera=camera)
            accum = jnp.zeros_like(accum)
            n_accum = 0
            env_rgb = frame_env_color(scene, cfg) if banded else None
            # --live-pack: tune the frame-global live-ray pack from the
            # EXACT pose-static entry-tau mask (drop-free by construction;
            # the headline bench lever, docs/PERFORMANCE.md). Coarse 1/8
            # cap rounding keeps the jitted program shape stable across
            # camera moves (a cap change retraces the banded program).
            from neuralradiancecaching_tpu.render import pathtrace
            if (banded and args.live_pack != "off"
                    and pathtrace.shade_deferred(cfg)):
                frac = (live_fraction(scene, cfg)
                        if args.live_pack == "auto"
                        else float(args.live_pack))
                cap = min(1.0, float(np.ceil((frac * 1.05 + 0.005) / 0.125)
                                     * 0.125))
                if cap != cfg.render.live_pack_fraction:
                    cfg = dataclasses.replace(cfg, render=dataclasses.replace(
                        cfg.render, live_pack_fraction=cap))
            # the live-ray pack is pose-static too (deterministic
            # entry-tau mask) -- hoist it with the env composite. On a
            # mesh the pack's band count rounds up to the device count
            # (whole packed bands stripe across devices,
            # dp_render_banded_packed)
            live_pack = (frame_live_pack(scene, cfg, band,
                                         multiple_of=n_dev)
                         if banded
                         and cfg.render.live_pack_fraction > 0.0 else None)
            # --probe-caps (VERDICT r4 item 4): on a mesh the query/shade
            # caps apply PER SHARD, so frame-mean defaults risk shard-local
            # drops under band-striping skew. Probe every shard's own
            # fractions at this pose (parallel.probe_dp_caps: worst-shard
            # sizing, drop-free by construction) and tighten the caps.
            # Caps round UP to 1/16 so the jitted program shape survives
            # pose-to-pose wiggle (same reason as the 1/8 live-pack
            # rounding above); 'uncapped' disables compaction caps
            # entirely (the drop-free oracle the mesh test compares
            # against); 'off' keeps the config defaults.
            from neuralradiancecaching_tpu.render import pathtrace
            if (mesh is not None and banded and cfg.render.use_nn
                    and pathtrace.shade_deferred(cfg)
                    and args.probe_caps == "auto"):
                from neuralradiancecaching_tpu.parallel import probe_dp_caps
                cfg_t, _rep = probe_dp_caps(scene, cfg, n_dev,
                                            band_rows=band, pack=live_pack)
                qc = min(1.0, float(np.ceil(
                    cfg_t.render.query_cap_fraction / 0.0625) * 0.0625))
                sc = float(np.ceil(cfg_t.render.shade_cap_fraction
                                   / 0.0625) * 0.0625)
                if (qc, sc) != (cfg.render.query_cap_fraction,
                                cfg.render.shade_cap_fraction):
                    cfg = dataclasses.replace(cfg, render=dataclasses.replace(
                        cfg.render, query_cap_fraction=qc,
                        shade_cap_fraction=sc))
                print(f"probe-caps: query_cap={qc} shade_cap={sc} "
                      f"(per-shard worst: q={_rep.query_frac.max():.4f} "
                      f"ev={_rep.event_mean.max():.4f})")
            elif (mesh is not None and banded
                  and args.probe_caps == "uncapped"):
                cfg = dataclasses.replace(cfg, render=dataclasses.replace(
                    cfg.render, query_cap_fraction=1.0,
                    shade_cap_fraction=float(cfg.path.max_bounces)))
        key = jax.random.PRNGKey(args.seed * 31 + i)
        # --train-every N: amortized online training (the train step is a
        # whole separate device program ~as expensive as the render; N>1
        # runs it every Nth frame and re-bakes on the same cadence)
        do_train = i % max(getattr(args, "train_every", 1), 1) == 0
        # the bake only changes when the state does -- never rebake on a
        # frame that didn't train
        rebake = baked is None or (do_train
                                   and i % max(args.bake_every, 1) == 0)
        if mesh is not None and banded:
            from neuralradiancecaching_tpu.parallel import (
                dp_render_banded, dp_render_banded_packed,
                dp_train_banded_frame)
            if do_train:
                state, img, mse, baked2 = dp_train_banded_frame(
                    state, scene, key, cfg, mesh, band_rows=band,
                    env_rgb=env_rgb, baked=None if rebake else baked,
                    pack=live_pack)
                if rebake:
                    baked = baked2
            elif live_pack is not None:
                img = dp_render_banded_packed(
                    state, scene, key, cfg, mesh, band_rows=band,
                    env_rgb=env_rgb, baked=baked, pack=live_pack)
            else:
                img = dp_render_banded(state, scene, key, cfg, mesh,
                                       band_rows=band, env_rgb=env_rgb,
                                       baked=baked)
        elif mesh is not None:
            from neuralradiancecaching_tpu.parallel import dp_frame_step
            state, img, mse = dp_frame_step(state, scene, key, cfg, mesh,
                                            train=do_train)
        elif banded:
            from neuralradiancecaching_tpu.render.tiled import render_banded
            k1, k2 = jax.random.split(key)
            if do_train:
                state, mse = frame_mod.train_only_step(state, scene, k1, cfg)
            if rebake:
                baked = nrc_mod.bake(state, cfg)
            img = render_banded(state, scene, k2, cfg, band_rows=band,
                                env_rgb=env_rgb, baked=baked,
                                pack=live_pack)
        else:
            state, out = frame_mod.frame_step(state, scene, key, cfg,
                                              train=do_train)
            img = out.image
            if do_train:  # no-train frames report 0, not a real loss
                mse = out.mse
        accum = accum + img.reshape(accum.shape)
        n_accum += 1
        # metrics land once per sync window: between syncs the host only
        # DISPATCHES (device still busy), so a per-frame wall clock would
        # report dispatch latency as throughput; the window average over
        # the hard sync is the true rate
        sync = (i % max(args.sync_every, 1) == args.sync_every - 1
                or i == args.frames - 1)
        if sync:
            mse_f = float(np.asarray(mse))
            frames_w = i + 1 - win_i
            dt_w = (time.perf_counter() - win_t0) / frames_w
            log.log(i, mse=mse_f, frame_s=round(dt_w, 3), frames=frames_w,
                    mrays_s=round(args.width * args.height / dt_w / 1e6, 4))
            print(f"frame {i}: {dt_w:.2f}s/frame mse={mse_f:.5f}")
            win_t0, win_i = time.perf_counter(), i + 1
    _save_frame(args.out, "progressive", np.asarray(accum / n_accum))


def _apply_platform(platform: str | None) -> None:
    """Pin the JAX platform before first backend use.

    In this environment jax is pre-imported at interpreter startup with
    JAX_PLATFORMS=axon, so setting the env var from a test subprocess is
    ignored -- the override must go through jax.config (same as
    tests/conftest.py). `--platform`/NRC_PLATFORM makes CLI subprocesses
    (e.g. tests) actually run on CPU instead of silently landing on the TPU.
    """
    platform = platform or os.environ.get("NRC_PLATFORM")
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="neuralradiancecaching_tpu")
    p.add_argument("--platform", type=str, default=None,
                   help="force a JAX platform (cpu/axon/tpu); also "
                        "settable via NRC_PLATFORM")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("mnist", help="BASELINE config 1")
    _common(sp)
    sp.add_argument("--steps", type=int, default=300)
    sp.add_argument("--limit", type=int, default=10000)
    sp.set_defaults(fn=cmd_mnist)

    sp = sub.add_parser("image-fit", help="BASELINE config 2")
    _common(sp)
    sp.add_argument("--steps", type=int, default=500)
    sp.set_defaults(fn=cmd_image_fit)

    sp = sub.add_parser("pathtrace", help="BASELINE config 3 (cache off)")
    _common(sp)
    sp.add_argument("--width", type=int, default=800)
    sp.add_argument("--height", type=int, default=800)
    sp.add_argument("--spp", type=int, default=1)
    sp.add_argument("--sampler", type=str, default="reference",
                    choices=["reference", "collision", "delta"],
                    help="distance sampler: reference march, baked "
                         "collision field (fast), or unbiased delta "
                         "tracking (ground truth)")
    sp.set_defaults(fn=cmd_pathtrace)

    sp = sub.add_parser("nrc-online", help="BASELINE config 4")
    _common(sp)
    sp.add_argument("--width", type=int, default=800)
    sp.add_argument("--height", type=int, default=800)
    sp.add_argument("--frames", type=int, default=8)
    sp.add_argument("--checkpoint", type=str, default=None)
    sp.add_argument("--resume", type=str, default=None)
    sp.add_argument("--mesh", type=str, default="off",
                    help="data-parallel mesh: off | auto (all devices) | N")
    sp.add_argument("--sampler", type=str, default=None,
                    choices=["reference", "collision", "delta"],
                    help="distance sampler override (delta = unbiased "
                         "ground truth for parity runs)")
    sp.set_defaults(fn=cmd_nrc_online)

    sp = sub.add_parser("progressive", help="BASELINE config 5 (1080p)")
    _common(sp)
    sp.add_argument("--width", type=int, default=1920)
    sp.add_argument("--height", type=int, default=1080)
    sp.add_argument("--frames", type=int, default=4)
    sp.add_argument("--move-every", dest="move_every", type=int, default=4,
                    help="camera fly-through step interval (frames)")
    sp.add_argument("--bake-every", dest="bake_every", type=int, default=4,
                    help="dense-MRHE rebake interval (frames); cache drift "
                         "per frame is tiny at production lr")
    sp.add_argument("--train-every", dest="train_every", type=int, default=1,
                    help="train-step interval (frames): 1 trains every "
                         "frame like the reference (main.cpp:181-246); N>1 "
                         "amortizes the train step over N frames for "
                         "interactive rates (pair with --bake-every)")
    sp.add_argument("--sync-every", dest="sync_every", type=int, default=4,
                    help="host sync interval (frames); dispatches pipeline "
                         "K frames ahead between syncs")
    sp.add_argument("--mesh", type=str, default="off",
                    help="data-parallel mesh: off | auto (all devices) | N")
    sp.add_argument("--sampler", type=str, default=None,
                    choices=["reference", "collision", "delta"],
                    help="distance sampler override (delta = unbiased "
                         "batched Woodcock; runs the same deferred "
                         "production pipeline)")
    sp.add_argument("--probe-caps", dest="probe_caps", type=str,
                    default="auto", choices=["auto", "off", "uncapped"],
                    help="per-shard cap probing on a mesh: auto probes "
                         "every shard's query/event fractions at each pose "
                         "and sizes the caps to the worst shard (drop-free "
                         "by construction, parallel.probe_dp_caps); off "
                         "keeps config defaults; uncapped disables "
                         "compaction caps (drop-free oracle for tests)")
    sp.add_argument("--band-rows", dest="band_rows", type=int, default=0,
                    help="override the banded-render row height (0 = auto; "
                         "height must divide n_dev * rows)")
    sp.add_argument("--live-pack", dest="live_pack", type=str,
                    default="auto",
                    help="frame-global live-ray packing: auto (probe the "
                         "exact pose-static live fraction, drop-free), a "
                         "fraction, or off. Banded paths only (single "
                         "device + mesh); ignored for non-deferred "
                         "pipelines")
    sp.set_defaults(fn=cmd_progressive)

    args = p.parse_args(argv)
    _apply_platform(args.platform)
    from neuralradiancecaching_tpu.utils import setup_cache
    setup_cache()
    args.fn(args)


if __name__ == "__main__":
    main()
