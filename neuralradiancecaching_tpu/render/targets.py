"""Self-training target generation: the nrc-train.comp kernel's path logic.

Per train ray (TracePathAndLearn, nrc-train.comp:1173-1226):
  1. random-walk from the camera with Russian-roulette termination whose
     survival probability halves each bounce, scattering (HG) only where
     density > 0;
  2. if the walk never scattered, fall back to (entry, -normalize(entry));
  3. the training target is the mean of `target_samples` independent
     TracePath estimates (64-vertex scatter walks, :1123-1171) from the
     chosen vertex;
  4. the (pos, dir, target) triple feeds the fused encode+MLP backward.

TPU-native: the vertex-selection walk is one masked scan over the whole
10k-ray batch; the 8 target estimates are a vmap over keys of the no-NN
``trace_path`` scan. No host round-trips -- the entire batch is formed
on-device inside the jitted frame step.

Note on env light: the reference's train-side TraceScene omits env sampling
(nrc-train.comp:1116-1120) so with the default zero-strength dir/point
lights every target is black. ``TrainConfig.env_samples > 0`` (default 8)
includes the render-side env estimator in the targets so the cache learns
the same radiance the render pass shows (transmittance-weighted, matching
nrc-forward.frag:710-749 rather than the train shader's dead variant that
drops the transmittance factor, nrc-train.comp:1096-1114).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from neuralradiancecaching_tpu.config import NRCConfig
from neuralradiancecaching_tpu.ops import phase as phase_ops
from neuralradiancecaching_tpu.ops import volume as volume_ops
from neuralradiancecaching_tpu.render import pathtrace
from neuralradiancecaching_tpu.scene.camera import Camera, pixel_rays
from neuralradiancecaching_tpu.scene.scene import Scene


def _train_walk_cfg(cfg: NRCConfig) -> NRCConfig:
    """Train-side walk overrides (vs the shipped render estimator):

    * keep the ROW tau at slot 0 (entry_tau_steps=0). The render's
      exact-entry-tau fix (PathTraceConfig.entry_tau_steps) targets
      PRIMARY rays sitting on the box face, where the collision row's
      voxel-center anchor erred +6.5% on the first-event p_sc
      (scripts/profile_coll_bias.py). Paying its 64-step quadrature
      in-program inside the train walks measured +62 ms/step (165.6 vs
      103.7 ms, BENCH r4) for no usable accuracy:
        - the VERTEX walk (use_nn=True over camera rays) consumes only
          query_pos/query_dir and (query_weight > 0) -- the exact tau can
          only shift the cut-distance distribution a few percent, not any
          estimator value;
        - the TARGET walk starts at INTERIOR RR-cut vertices, where the
          row bias measured -1.0% -- and the renderer's own interior
          continuation events keep the row tau too, so row-tau targets
          are CONSISTENT with what the shipped pipeline integrates.
      Validated: cache_rel_err_binned unchanged (A/B in the r4 ledger).
    * the aggressive p1=4 no-NN march split (coll_target_phase1_steps):
      valid ONLY for interior-start target walks (slot-4 live 5.07% vs
      the 1/16 cap); camera no-NN walks keep the drop-free p1=8 default
      (coll_nonn_phase1_steps -- see the r5 correction note there).
    * the r5 cascade split (coll_target_phase2_steps -> a second repack
      at global slot p1+p2a, where target-walk live is 0.52% of n vs the
      1/64 cap -- 3x margin) and bf16 shade-event stacks
      (coll_target_shade_bf16): both scoped to the TRAIN walks for the
      same reason as p1=4 -- camera no-NN walks (the ground-truth legs)
      decay slower and stay on the conservative defaults."""
    p = cfg.path
    p2 = dataclasses.replace(
        p, entry_tau_steps=0,
        coll_nonn_phase1_steps=p.coll_target_phase1_steps,
        coll_nonn_phase2_steps=p.coll_target_phase2_steps,
        coll_shade_bf16=p.coll_target_shade_bf16,
        coll_shade_cap_p1=p.coll_target_shade_cap_p1)
    if p2 == p:
        return cfg
    return dataclasses.replace(cfg, path=p2)


class TrainBatch(NamedTuple):
    pos: jnp.ndarray     # (N, 3) query vertex positions
    dir: jnp.ndarray     # (N, 3) query directions
    target: jnp.ndarray  # (N, 3) path-traced radiance targets (clamped)


def choose_train_vertices(scene: Scene, cfg: NRCConfig, ro: jnp.ndarray,
                          rd: jnp.ndarray, key: jax.Array
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The RR vertex-selection walk (nrc-train.comp:1173-1215).

    Returns (pos (N,3), dir (N,3)) of the chosen self-training vertex.
    """
    vol = cfg.volume
    pt = cfg.path
    n = ro.shape[0]
    dtype = ro.dtype

    # miss rays get re-aimed at the origin (train main, :1252-1255)
    _, _, hit = volume_ops.ray_aabb(ro, rd, vol.box_size, vol.box_center)
    rd = jnp.where(hit[:, None], rd,
                   -ro / jnp.linalg.norm(ro, axis=-1, keepdims=True))

    entry, _, _ = volume_ops.entry_exit_points(ro, rd, vol.box_size,
                                               vol.box_center)

    class S(NamedTuple):
        pos: jnp.ndarray
        dir: jnp.ndarray
        term_prob: jnp.ndarray
        done: jnp.ndarray
        did_scatter: jnp.ndarray

    init = S(pos=entry, dir=rd, term_prob=jnp.ones((n,), dtype=dtype),
             done=jnp.zeros((n,), dtype=bool),
             did_scatter=jnp.zeros((n,), dtype=bool))

    def step(s: S, u_step):
        u, u_hg1, u_hg2, u2 = (u_step[0], u_step[1], u_step[2], u_step[3])
        # break BEFORE the bounce (train :1192-1196)
        stop = (u > s.term_prob) & ~s.done
        done = s.done | stop
        term_prob = jnp.where(done, s.term_prob, s.term_prob * pt.rr_decay)

        density = volume_ops.density_at(scene.density, s.pos, vol)
        scatter = (density > 0.0) & ~done
        new_dir = phase_ops.hg_direction_from_uniforms(u_hg1, u_hg2, s.dir,
                                                       vol.hg_g)
        d = jnp.where(scatter[:, None], new_dir, s.dir)
        did_scatter = s.did_scatter | scatter

        _, t_exit, _ = volume_ops.ray_aabb(s.pos, d, vol.box_size,
                                           vol.box_center)
        dist = u2 * jnp.maximum(t_exit, 0.0) * pt.step_fraction
        pos = jnp.where(done[:, None], s.pos, s.pos + d * dist[:, None])
        return S(pos, d, term_prob, done, did_scatter), None

    # survival past step k is rr_decay^(k(k-1)/2) -- vertex_walk_steps=16
    # is distributionally indistinguishable from the reference's 64
    # iterations (P < 2^-120) at a quarter of the cost
    walk_steps = min(cfg.train.vertex_walk_steps or cfg.train.target_bounces,
                     cfg.train.target_bounces)
    u_walk = jax.random.uniform(key, (walk_steps, 4, n), dtype=dtype)
    final, _ = jax.lax.scan(step, init, u_walk)

    # never-scattered fallback (train :1211-1215)
    fallback_dir = -entry / jnp.maximum(
        jnp.linalg.norm(entry, axis=-1, keepdims=True), 1e-8)
    pos = jnp.where(final.did_scatter[:, None], final.pos, entry)
    d = jnp.where(final.did_scatter[:, None], final.dir, fallback_dir)
    return pos, d


def choose_train_vertices_collision(scene: Scene, cfg: NRCConfig,
                                    ro: jnp.ndarray, rd: jnp.ndarray,
                                    key: jax.Array
                                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Collision-sampler vertex selection (PathTraceConfig.sampler=
    'collision'): run the EXACT walk the renderer runs (the NN-mode
    analytic collision march, pathtrace.trace_path_collision) and harvest
    its Russian-roulette cut point -- the same (position, incoming
    direction) rule the cache will be queried with.

    This matters: an earlier last-collision heuristic walk produced
    vertices covering only 4 of 12 occupied (octant x direction) bins of
    the real query distribution -- the cache fit its train points to ~9%
    yet erred 33-120% in the uncovered bins (scripts/profile_cache_diag).
    Matching the train distribution to the query distribution by
    construction removes the shift.

    Rays whose walk records no cut (miss / no scatter / early escape)
    fall back to (entry, -normalize(entry)) like the reference's train
    main (nrc-train.comp:1252-1255).
    """
    vol = cfg.volume
    n = ro.shape[0]

    _, _, hit = volume_ops.ray_aabb(ro, rd, vol.box_size, vol.box_center)
    rd = jnp.where(hit[:, None], rd,
                   -ro / jnp.linalg.norm(ro, axis=-1, keepdims=True))
    entry, _, _ = volume_ops.entry_exit_points(ro, rd, vol.box_size,
                                               vol.box_center)

    res = pathtrace.trace_path_collision(scene, _train_walk_cfg(cfg), ro, rd,
                                         key, use_nn=True, env_samples=0)
    has = res.query_weight > 0.0

    fallback_dir = -entry / jnp.maximum(
        jnp.linalg.norm(entry, axis=-1, keepdims=True), 1e-8)
    pos = jnp.where(has[:, None], res.query_pos, entry)
    d = jnp.where(has[:, None], res.query_dir, fallback_dir)
    return pos, d


def trace_target_paths(scene: Scene, cfg: NRCConfig, pos: jnp.ndarray,
                       d: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Batched TracePath (nrc-train.comp:1123-1171) for target generation:
    the fixed `target_bounces`-step scatter walk, no Russian roulette, no
    cache queries.

    TPU-native structure, distinct from the render-side ``trace_path``:
    events are recorded as per-step scan OUTPUTS (one (steps, N, .) write
    each step) instead of K per-ray slots -- the target walk scatters on
    ~half its 64 steps (measured), so slot recording would rewrite an
    O(N * 64) buffer every step. Shading then runs once over the flat
    (steps * N) events, packed to the front in step-major order and capped
    at ``train.compact_events * N`` (overflow drops are the deepest,
    dimmest events across all rays).

    pos/d: (N, 3) starting vertices/directions. Returns (N, 3) scattered
    radiance.
    """
    vol = cfg.volume
    pt = cfg.path
    steps = cfg.train.target_bounces
    env_samples = cfg.train.env_samples
    n = pos.shape[0]
    dtype = pos.dtype

    entry, _, _ = volume_ops.entry_exit_points(pos, d, vol.box_size,
                                               vol.box_center)

    def step(carry, u):
        cur, last, cd = carry
        dens = volume_ops.density_at(scene.density, cur, vol)
        scatter = dens > 0.0
        ys = (cur, last, cd, dens, scatter)
        new_last = jnp.where(scatter[:, None], cur, last)
        nd = phase_ops.hg_direction_from_uniforms(u[1], u[2], cd, vol.hg_g)
        cd = jnp.where(scatter[:, None], nd, cd)
        _, t_exit, _ = volume_ops.ray_aabb(cur, cd, vol.box_size,
                                           vol.box_center)
        nxt = cur + cd * (u[3] * jnp.maximum(t_exit, 0.0)
                          * pt.step_fraction)[:, None]
        return (nxt, new_last, cd), ys

    u_walk = jax.random.uniform(jax.random.fold_in(key, 0),
                                (steps, 4, n), dtype=dtype)
    _, (ev_pos, ev_prev, ev_dir, ev_dens, valid) = jax.lax.scan(
        step, (entry, entry, d), u_walk)

    k_scene = jax.random.fold_in(key, 1)

    def _segment_t(a, b):
        if pt.transmittance_mode == "field":
            from neuralradiancecaching_tpu.ops import lightfield
            return lightfield.segment_transmittance_field(
                scene.env_t_field, a, b, vol)
        return volume_ops.transmittance(scene.density, a, b,
                                        pt.transmittance_steps, vol)

    ns = steps * n
    cap = (min(ns, max(1024, int(n * cfg.train.compact_events)))
           if cfg.train.compact_events > 0 else ns)
    packed = jnp.concatenate(
        [ev_pos, ev_prev, ev_dir, ev_dens[..., None]],
        axis=-1).reshape(ns, 10)
    flat_valid = valid.reshape(ns)
    if cap < ns:
        sel = jnp.argsort(~flat_valid)[:cap]
        rows = jnp.take(packed, sel, axis=0)
        sel_valid = jnp.take(flat_valid, sel)
        t_r_sel = _segment_t(rows[:, 0:3], rows[:, 3:6])
        light_sel = pathtrace.trace_scene(scene, cfg, rows[:, 0:3],
                                          rows[:, 6:9], k_scene, env_samples)
        t_r = jnp.ones((ns,), dtype=dtype).at[sel].set(
            jnp.where(sel_valid, t_r_sel, 1.0)).reshape(steps, n)
        light = jnp.zeros((ns, 3), dtype=dtype).at[sel].set(
            jnp.where(sel_valid[:, None], light_sel, 0.0)
        ).reshape(steps, n, 3)
    else:
        t_r_all = _segment_t(packed[:, 0:3], packed[:, 3:6])
        light_all = pathtrace.trace_scene(scene, cfg, packed[:, 0:3],
                                          packed[:, 6:9], k_scene,
                                          env_samples)
        t_r = jnp.where(flat_valid, t_r_all, 1.0).reshape(steps, n)
        light = jnp.where(flat_valid[:, None], light_all,
                          0.0).reshape(steps, n, 3)

    t_incl = jnp.cumprod(t_r, axis=0)  # throughput AFTER each step's event
    t_before = jnp.concatenate(
        [jnp.ones((1, n), dtype=dtype), t_incl[:-1]], axis=0)
    contrib = (valid * t_before * ev_dens)[..., None] * light
    return jnp.sum(contrib, axis=0)  # (N, 3)


def generate_train_batch(scene: Scene, cfg: NRCConfig,
                         key: jax.Array) -> TrainBatch:
    """Full train-batch generation for one frame: (jittered) train-grid
    rays -> RR vertices -> averaged path-traced targets (clamped to
    target_clamp, nrc-train.comp:987). Pixel jitter makes the vertex
    coverage continuous across steps (see camera.pixel_rays);
    TrainConfig.jitter_train_grid=False reproduces the reference's fixed
    100x100 grid (nrc-train.comp:1217)."""
    k_j, key = jax.random.split(key)
    ro, rd = train_ray_pool(scene, cfg, k_j)
    return generate_train_batch_for_rays(scene, cfg, key, ro, rd,
                                         expanded=True)


def train_ray_pool(scene: Scene, cfg: NRCConfig, key: jax.Array
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The full camera-ray pool for ONE train step: the (jittered) train
    grid, stacked `vertex_oversample` times with independent jitters in
    collision mode (the oversampled RR-cut vertex source).

    Ray-pool construction lives HERE -- before any sharding -- so the
    data-parallel path shards the SAME pool a single chip consumes
    (`dp_train_step` splits it across devices; previously each device
    rebuilt full oversample grids from inside its shard, duplicating
    ~(over-1)x the walk work per device and decoupling the batch from the
    shard). Copy 0 honors TrainConfig.jitter_train_grid; the extra
    oversample copies are always jittered (they exist to diversify cut
    positions)."""
    tw, th = cfg.train.train_width, cfg.train.train_height
    over = (max(1, cfg.train.vertex_oversample)
            if cfg.path.sampler in ("collision", "delta") else 1)
    ros, rds = [], []
    for i in range(over):
        jk = (jax.random.fold_in(key, i)
              if (i > 0 or cfg.train.jitter_train_grid) else None)
        r_o, r_d = pixel_rays(scene.camera, tw, th, jitter_key=jk)
        ros.append(r_o)
        rds.append(r_d)
    if over == 1:
        return ros[0], rds[0]
    return jnp.concatenate(ros), jnp.concatenate(rds)


def generate_train_batch_for_rays(scene: Scene, cfg: NRCConfig,
                                  key: jax.Array, ro: jnp.ndarray,
                                  rd: jnp.ndarray,
                                  expanded: bool = True) -> TrainBatch:
    """Train batch for an explicit ray set (the data-parallel path passes
    each device's shard of :func:`train_ray_pool`).

    expanded (default True -- every in-tree caller passes
    train_ray_pool-shaped rays): the rays already contain the
    vertex_oversample copies; the returned batch has
    ``ro.shape[0] // vertex_oversample`` rows. False treats the rays as a
    plain grid and tiles THEM for oversampling (no extra pixel jitter;
    explicit-opt-in degraded mode for raw ray sets).

    The `target_samples` estimates run as ONE batched walk of
    (target_samples * n_rays) rays -- bigger batches amortize the
    descriptor-bound gathers far better than the reference's per-thread
    sample loop (nrc-train.comp:1217-1223) translated literally."""
    k_v, k_t = jax.random.split(key)
    if cfg.path.sampler in ("collision", "delta"):
        # both route through trace_path_collision (which dispatches on the
        # sampler): delta trains on UNBIASED binary-branch walks, collision
        # on the analytic-weight baked-field walks the renderer uses
        return _collision_train_batch(scene, cfg, k_v, k_t, ro, rd,
                                      expanded)
    pos, d = choose_train_vertices(scene, cfg, ro, rd, k_v)

    s_count = cfg.train.target_samples
    n = pos.shape[0]
    pos_t = jnp.tile(pos, (s_count, 1))
    d_t = jnp.tile(d, (s_count, 1))
    scattered = trace_target_paths(scene, cfg, pos_t, d_t, k_t)
    target = jnp.mean(scattered.reshape(s_count, n, 3), axis=0)
    target = jnp.minimum(target, cfg.train.target_clamp)
    return TrainBatch(pos=pos, dir=d, target=target)


def cache_targets_collision(scene: Scene, cfg: NRCConfig, pos: jnp.ndarray,
                            d: jnp.ndarray, key: jax.Array,
                            samples: int | None = None) -> jnp.ndarray:
    """MC estimate of the cache's target quantity S(x, d_in) = NEE(x, d_in)
    + mean over `samples` HG-sampled continuation walks, each an
    analytic-weight collision walk (pathtrace.trace_path_collision with the
    env composite excluded -- continuation escapes are covered by NEE, see
    the estimator note in trace_path_collision). Also the bench's converged
    cache-quality probe (bench.py quality_metrics)."""
    k_nee, k_dirs, k_t = jax.random.split(key, 3)
    n = pos.shape[0]
    s_count = samples if samples is not None else cfg.train.target_samples

    nee = pathtrace.trace_scene(scene, cfg, pos, d, k_nee,
                                cfg.train.env_samples)

    pos_t = jnp.tile(pos, (s_count, 1))
    d_in_t = jnp.tile(d, (s_count, 1))
    d_t = phase_ops.sample_hg_direction(k_dirs, d_in_t, cfg.volume.hg_g)
    res = pathtrace.trace_path_collision(
        scene, _train_walk_cfg(cfg), pos_t, d_t, k_t, use_nn=False,
        env_samples=cfg.train.env_samples,
        max_bounces=cfg.train.target_bounces)
    cont = jnp.mean(res.scattered.reshape(s_count, n, 3), axis=0)
    return nee + cont


def _collision_train_batch(scene: Scene, cfg: NRCConfig, k_v: jax.Array,
                           k_t: jax.Array, ro: jnp.ndarray, rd: jnp.ndarray,
                           expanded: bool = False) -> TrainBatch:
    """Collision-mode train batch (see cache_targets_collision).

    With vertex_oversample > 1 the batch is filled with REAL RR-cut
    vertices compacted from an oversampled jittered ray set
    (train_ray_pool when ``expanded``; a tiling of the given rays
    otherwise), so every gradient sample lies on the distribution the
    render actually queries (TrainConfig.vertex_oversample)."""
    over = max(1, cfg.train.vertex_oversample)
    n = ro.shape[0] // over if expanded else ro.shape[0]
    if over > 1:
        from neuralradiancecaching_tpu.ops import compact

        k_w = k_v
        if expanded:
            ro_all, rd_all = ro, rd
        else:
            ro_all = jnp.tile(ro, (over, 1))
            rd_all = jnp.tile(rd, (over, 1))
        res = pathtrace.trace_path_collision(scene, _train_walk_cfg(cfg),
                                             ro_all, rd_all, k_w,
                                             use_nn=True, env_samples=0)
        has = res.query_weight > 0.0
        # permute lanes before the stable pack: compact_select keeps the
        # FIRST n marked lanes, and the last partially-consumed jitter set
        # would otherwise contribute only top-of-frame cuts (ADVICE r2) --
        # permuted, the kept cuts are a uniform subsample of all cuts
        perm = jax.random.permutation(jax.random.fold_in(k_w, 1),
                                      ro_all.shape[0])
        sel_p, val = compact.compact_select(jnp.take(has, perm), n)
        sel = jnp.take(perm, sel_p)
        pos = jnp.take(res.query_pos, sel, axis=0)
        d = jnp.take(res.query_dir, sel, axis=0)
        # not enough cuts: fall back to (entry, inward) on padding lanes
        entry, _, hit = volume_ops.entry_exit_points(
            ro_all[:n], rd_all[:n], cfg.volume.box_size,
            cfg.volume.box_center)
        fb_dir = -entry / jnp.maximum(
            jnp.linalg.norm(entry, axis=-1, keepdims=True), 1e-8)
        pos = jnp.where(val[:, None], pos, entry)
        d = jnp.where(val[:, None], d, fb_dir)
    else:
        pos, d = choose_train_vertices_collision(scene, cfg, ro, rd, k_v)
    target = cache_targets_collision(scene, cfg, pos, d, k_t)
    target = jnp.minimum(target, cfg.train.target_clamp)
    return TrainBatch(pos=pos, dir=d, target=target)
