"""Monte-Carlo volumetric path tracing -- the nrc-forward.frag /
path-tracer.frag logic, TPU-native.

Reference call structure (nrc-forward.frag:758-834): per-pixel fragment
threads walk up to 32 scatter vertices with data-dependent early exits
(Russian-roulette termination into a cache query). Here the walk is a
``jax.lax.scan`` with a per-ray alive mask over a fixed trip count -- the
SURVEY.md §7 translation of control-flow divergence. The cache query is NOT
evaluated inside the scan: each ray terminates into at most one query, so the
scan only records (query_pos, query_dir, query_weight) and the caller runs a
single batched MLP evaluation afterwards -- turning 32 masked MLP calls into
one MXU-shaped batch.

All randomness is counter-based threefry (`jax.random.fold_in` per step)
replacing the reference's fract-sin chain.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from neuralradiancecaching_tpu.config import NRCConfig
from neuralradiancecaching_tpu.ops import envmap as envmap_ops
from neuralradiancecaching_tpu.ops import phase as phase_ops
from neuralradiancecaching_tpu.ops import volume as volume_ops
from neuralradiancecaching_tpu.scene.scene import Scene

# A cache query function: (pos (N,3), dir (N,3)) -> radiance (N,3)
QueryFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def trace_scene(scene: Scene, cfg: NRCConfig, pos: jnp.ndarray,
                direction: jnp.ndarray, key: jax.Array,
                env_samples: int) -> jnp.ndarray:
    """Direct in-scattered light at a scatter vertex (TraceScene,
    nrc-forward.frag:751-755 = dir light + point light + env samples).

    pos/direction: (N, 3). Static flags (light enables, sample counts) gate
    code generation so disabled lights cost nothing (the reference pays a
    runtime branch; XLA would otherwise evaluate both sides under vmap).
    """
    vol = cfg.volume
    n = pos.shape[0]
    total = jnp.zeros((n, 3), dtype=pos.dtype)

    def segment_t(a, b, tag):
        """Segment transmittance: tau-field (fast), quadrature (the
        reference's scheme), or ratio tracking (unbiased)."""
        if cfg.path.transmittance_mode == "field":
            from neuralradiancecaching_tpu.ops import lightfield
            return lightfield.segment_transmittance_field(
                scene.env_t_field, a, b, vol)
        if cfg.path.transmittance_mode == "ratio":
            sig = (vol.density_factor
                   * jnp.max(scene.density_grid).astype(pos.dtype) + 1e-8)
            return volume_ops.transmittance_ratio(
                scene.density, a, b, jax.random.fold_in(key, 9100 + tag),
                cfg.path.ratio_tracking_steps, sig, vol)
        return volume_ops.transmittance(scene.density, a, b,
                                        cfg.path.transmittance_steps, vol)

    if cfg.dir_light.enabled:
        # TraceDirLight (frag:664-675): transmittance toward the light
        # (exit point along -light_dir), HG phase, white * strength
        # (the reference ignores the light's color here -- kept).
        l = scene.dir_light
        to_light = -l.direction / jnp.linalg.norm(l.direction)
        _, exit_p, _ = volume_ops.entry_exit_points(
            pos, jnp.broadcast_to(to_light, pos.shape), vol.box_size,
            vol.box_center)
        t = segment_t(pos, exit_p, 1)
        ph = phase_ops.hg_phase(jnp.sum(l.direction * -direction, axis=-1),
                                vol.hg_g)
        total = total + (t * l.strength * ph)[:, None] * jnp.ones((1, 3))

    if cfg.point_light.enabled:
        # TracePointLight (frag:677-688): transmittance from the light to the
        # vertex; NOTE no 1/r^2 falloff in the reference -- kept.
        l = scene.point_light
        lpos = jnp.broadcast_to(l.position, pos.shape)
        t = segment_t(lpos, pos, 2)
        wi = lpos - pos
        wi = wi / jnp.maximum(jnp.linalg.norm(wi, axis=-1, keepdims=True),
                              1e-8)
        ph = phase_ops.hg_phase(jnp.sum(wi * -direction, axis=-1), vol.hg_g)
        total = total + l.color[None, :] * (l.strength * t * ph)[:, None]

    if env_samples > 0 and cfg.env_map.in_scatter_mode == "field":
        # the MC estimator's expectation, baked: ONE row gather per event
        # (ops/lightfield.py build_scatter_field). Replaces env_samples x
        # (HG draw + tau gather + env gather).
        from neuralradiancecaching_tpu.ops import lightfield
        total = total + scene.env.hpm_strength * \
            lightfield.query_radiance_field(scene.env_s_field, pos,
                                            direction, vol)
    elif env_samples > 0:
        # SampleHdrEnvMap(pos, dir, N) (frag:710-749): phase-sampled rays
        # with transmittance to the box exit; optional inverse-CDF branch.
        n_cdf = int(round(env_samples * cfg.env_map.cdf_fraction))
        n_phase = env_samples - n_cdf

        def exit_transmittance(p, d, k):
            """T(p -> box exit along d): precomputed field (fast), the
            reference's quadrature (EnvMapConfig.transmittance_steps), or
            unbiased ratio tracking."""
            if cfg.env_map.transmittance_mode == "field":
                from neuralradiancecaching_tpu.ops import lightfield
                return lightfield.query_transmittance_field(
                    scene.env_t_field, p, d, vol)
            _, exit_p, _ = volume_ops.entry_exit_points(p, d, vol.box_size,
                                                        vol.box_center)
            if cfg.env_map.transmittance_mode == "ratio":
                sig = (vol.density_factor
                       * jnp.max(scene.density_grid).astype(p.dtype) + 1e-8)
                return volume_ops.transmittance_ratio(
                    scene.density, p, exit_p, jax.random.fold_in(k, 9201),
                    cfg.path.ratio_tracking_steps, sig, vol)
            return volume_ops.transmittance(
                scene.density, p, exit_p, cfg.env_map.transmittance_steps,
                vol)

        acc = jnp.zeros((n, 3), dtype=pos.dtype)
        for s in range(n_phase):
            ks = jax.random.fold_in(key, s)
            rnd_dir = phase_ops.sample_hg_direction(ks, direction, vol.hg_g)
            if cfg.env_map.transmittance_mode == "premultiplied":
                # one 12-float row: T * Env baked per (voxel, dir bucket)
                from neuralradiancecaching_tpu.ops import lightfield
                acc = acc + scene.env.hpm_strength \
                    * lightfield.query_radiance_field(scene.env_l_field,
                                                      pos, rnd_dir, vol)
            else:
                t = exit_transmittance(pos, rnd_dir, ks)
                light = envmap_ops.sample_direct(scene.env, rnd_dir,
                                                 hpm=True)
                acc = acc + light * t[:, None]
        for s in range(n_cdf):
            ks = jax.random.fold_in(key, n_phase + s)
            rnd_dir, radiance = envmap_ops.importance_sample(
                scene.env, ks, (n,), cfg.quirks)
            t = exit_transmittance(pos, rnd_dir, ks)
            ph = phase_ops.hg_phase(jnp.sum(rnd_dir * -direction, axis=-1),
                                    vol.hg_g)
            acc = acc + radiance * scene.env.hpm_strength * (ph * t)[:, None]
        total = total + acc / env_samples

    return total


class PathResult(NamedTuple):
    scattered: jnp.ndarray     # (N, 3) accumulated in-scattered light
    transmittance: jnp.ndarray  # (N,) final path transmittance
    query_pos: jnp.ndarray     # (N, 3) cache-query position (NN mode)
    query_dir: jnp.ndarray     # (N, 3)
    query_weight: jnp.ndarray  # (N,) T * dirPhase at the RR cut; 0 if none


def trace_path_collision(scene: Scene, cfg: NRCConfig, ro: jnp.ndarray,
                         rd: jnp.ndarray, key: jax.Array, use_nn: bool,
                         env_samples: int | None = None,
                         max_bounces: int | None = None,
                         collect_events: bool = False,
                         entry_tau: jnp.ndarray | None = None):
    """Analytic-collision path walk (PathTraceConfig.sampler='collision').

    Replaces the reference's 32-step sequential density march with exact
    free-flight inverse-CDF sampling from the baked collision field
    (ops/collision.py): per scatter event, ONE row gather yields the total
    optical depth ahead (bilinear over direction) and the quantile knots of
    its cumulative profile. The scatter/escape branch is integrated
    ANALYTICALLY -- every event carries weight prod_j (1 - exp(-tau_j))
    instead of a sampled binary -- so K = expected-event-count slots replace
    the reference's max_bounces march steps, and the shading phase needs no
    per-segment transmittance at all.

    Estimator semantics (vs the 'reference' sampler, which reproduces the
    reference's ad-hoc U(0, 0.1 d_exit) scheme of nrc-forward.frag:814-818):
    this is the physically-based transmittance-sampled walk with
    next-event-estimation lighting and analytic primary see-through
    T0 = exp(-tau_0) -- the delta-tracking-class estimator BASELINE.json's
    north star asks for. PathResult.transmittance holds T0 (the composite
    adds T0 * env analytically; see render_image / finish_deferred).

    collect_events=True skips the shading phase and returns
    (PathResult with scattered=0, events (N, K, 7)) -- ray-major packed
    [pos(3), dir(3), weight(1)] rows with weight 0 for invalid slots --
    for the banded renderers' frame-global deferred shading
    (PathTraceConfig.defer_shade).
    """
    from neuralradiancecaching_tpu.ops import collision, compact

    vol = cfg.volume
    pt = cfg.path
    if env_samples is None:
        env_samples = cfg.env_map.n_samples
    if max_bounces is None:
        max_bounces = pt.max_bounces
    # with RR (survival halves per event) P(>6 events) < 2^-21: 6 slots are
    # distributionally exact; without RR every slot can scatter
    k_steps = (min(cfg.path.coll_max_events, max_bounces) if use_nn
               else max_bounces)
    n = ro.shape[0]
    dtype = ro.dtype
    half = jnp.asarray(vol.box_size, dtype) * 0.5
    ctr = jnp.asarray(vol.box_center, dtype)

    entry, _, hit = volume_ops.entry_exit_points(ro, rd, vol.box_size,
                                                 vol.box_center)

    # scan outputs are deliberately minimal: ONLY the per-event
    # (position, incoming dir, masked weight) -- measured
    # (scripts/profile_march_ops.py): the stacked scan outputs, not the
    # gather or the math, dominate the step once rows are bf16. The
    # RR-cut query and tau0 fire at most once per ray and live in the
    # CARRY instead of K stacked slots.
    class S(NamedTuple):
        pos: jnp.ndarray        # (N, 3) current vertex
        dir: jnp.ndarray        # (N, 3) current direction
        weight: jnp.ndarray     # (N,) prod of past scatter probabilities
        term_prob: jnp.ndarray  # (N,) RR survival threshold
        done: jnp.ndarray       # (N,) bool
        tau0: jnp.ndarray       # (N,) first-step tau (sentinel -1 unset)
        has_q: jnp.ndarray      # (N,) bool: RR cut recorded
        q_pos: jnp.ndarray      # (N, 3)
        q_dir: jnp.ndarray      # (N, 3) incoming dir at the cut
        last_in: jnp.ndarray    # (N, 3) previous event's incoming dir
        q_w: jnp.ndarray        # (N,) weight at the cut (incl. quirk phase)
        etau: jnp.ndarray       # (N,) exact entry tau (0-width when off)

    # exact slot-0 tau (PathTraceConfig.entry_tau_steps): primary rays sit
    # ON the box face, maximally far from the collision row's voxel-center
    # anchor -- measured +6.5% first-event p_sc / -1.1% T0 bias from the
    # row there (scripts/profile_coll_bias.py). One batched quadrature at
    # the exact entry fixes both; rides the CARRY so the march split packs
    # it with the lanes (it never fires after slot 0: tau0 is set then).
    exact_entry = (pt.sampler == "collision" and pt.entry_tau_steps > 0)
    if exact_entry and entry_tau is not None:
        # pose-static hoist: the per-frame quadrature costs ~20x the
        # march's own gather volume (measured 19.1 -> 6.7 Mrays/s when
        # computed in-program at 1080p) -- banded/packed callers pass the
        # per-pose tau (tiled.frame_entry_tau / frame_live_pack)
        etau0 = entry_tau.astype(dtype)
    elif exact_entry:
        _, exit_e, _ = volume_ops.entry_exit_points(entry, rd, vol.box_size,
                                                    vol.box_center)
        t_e = volume_ops.transmittance(scene.density, entry, exit_e,
                                       pt.entry_tau_steps, vol)
        etau0 = jnp.minimum(-jnp.log(jnp.maximum(t_e, 1e-20)), 40.0)
    else:
        etau0 = jnp.zeros((n,), dtype=dtype)

    init = S(pos=entry, dir=rd, weight=jnp.ones((n,), dtype=dtype),
             term_prob=jnp.ones((n,), dtype=dtype), done=~hit,
             tau0=jnp.full((n,), -1.0, dtype=dtype),
             has_q=jnp.zeros((n,), dtype=bool),
             q_pos=entry, q_dir=rd, last_in=rd,
             q_w=jnp.zeros((n,), dtype=dtype),
             etau=etau0)

    delta = pt.sampler == "delta"
    n_null = pt.delta_null_steps
    if delta and pt.delta_majorant == "local":
        # static coverage check: midpoint samples at spacing t_far /
        # samples must land within one coarse cell edge of every segment
        # point (t_far <= the box diagonal), or the per-event majorant is
        # not a bound and the walk would be biased
        import math as _math
        vox = [b / g for b, g in zip(vol.box_size, vol.grid_shape)]
        fpc = [-(-g // c) for g, c in zip(vol.grid_shape,
                                          pt.delta_majorant_cells)]
        min_edge = min(v * f for v, f in zip(vox, fpc))
        diag = _math.sqrt(sum(b * b for b in vol.box_size))
        if pt.delta_majorant_samples * min_edge < diag:
            raise ValueError(
                f"delta_majorant_samples={pt.delta_majorant_samples} cannot "
                f"cover the box diagonal {diag:.1f} at coarse cell edge "
                f"{min_edge:.2f}; need >= {diag / min_edge:.1f}")
        maj = volume_ops.majorant_grid(scene.density_grid.astype(dtype),
                                       pt.delta_majorant_cells)
        maj_flat = maj.reshape(-1)
        cell_sz = jnp.asarray([v * f for v, f in zip(vox, fpc)], dtype)
        cdims = pt.delta_majorant_cells

        def maj_lookup(p):
            """(R, 3) world points -> (R,) raw-density majorant bound."""
            rel = (p - (ctr - half)) / cell_sz
            idx = jnp.clip(rel.astype(jnp.int32), 0,
                           jnp.asarray(cdims, jnp.int32) - 1)
            flat = (idx[:, 0] * cdims[1] + idx[:, 1]) * cdims[2] + idx[:, 2]
            return jnp.take(maj_flat, flat, axis=0)

    # value-identical to casting the stacked (K, N, ...) outputs after the
    # scan (the cast is elementwise), but the scan writes half the bytes
    # (prefix-shade mode upcasts after the shade pack's gather --
    # PathTraceConfig.coll_shade_bf16; collect mode ships bf16 rows anyway)
    ys_bf16 = (collect_events and cfg.volume.field_dtype == "bfloat16") or (
        not collect_events and pt.coll_shade_cap > 0.0 and pt.coll_shade_bf16)

    def step(s: S, u_step):
        u_rr, u_t, u_hg1, u_hg2 = (u_step[0], u_step[1], u_step[2],
                                   u_step[3])
        if delta:
            # TRUE delta tracking (unbiased), BATCHED: with a constant
            # per-event majorant the Woodcock candidate distances are a
            # cumsum of iid exponentials -- independent of the density
            # values -- so all n_null candidate points are known upfront
            # and their acceptance tests run as ONE batched density gather
            # + first-acceptance argmax, instead of n_null SEQUENTIAL
            # gathers (TPU gathers are op-count bound, not row-count
            # bound; docs/PERFORMANCE.md). Estimator-identical to the
            # textbook sequential walk: same uniforms, same acceptance
            # rule, same exhaust-as-escape semantics.
            # delta_majorant='local' tightens sigma_maj per event from the
            # dilated coarse max grid (one extra batched gather), so the
            # same n_null budget covers a far smaller exhaust probability
            # -- or n_null can drop ~4x for the same one.
            # Reference baseline being improved on: the quadrature
            # free-flight march of nrc-train.comp:1032-1053,1164-1167.
            ln = s.pos.shape[0]  # lane count (n, or m1 after a march split)
            _, t_far, _ = volume_ops.ray_aabb(s.pos, s.dir, vol.box_size,
                                              vol.box_center)
            if pt.delta_majorant == "local":
                m = pt.delta_majorant_samples
                fr = (jnp.arange(m, dtype=dtype) + 0.5) / m
                sp = (s.pos[None]
                      + (fr[:, None] * t_far[None])[..., None] * s.dir[None])
                sigma_maj = (vol.density_factor
                             * jnp.max(maj_lookup(sp.reshape(-1, 3))
                                       .reshape(m, ln), axis=0) + 1e-8)
            else:
                # global: trilinear interpolation never exceeds the grid max
                sigma_maj = (vol.density_factor
                             * jnp.max(scene.density_grid).astype(dtype)
                             + 1e-8)
            u_null = u_step[4:].reshape(n_null, 2, -1)
            t_cand = (jnp.cumsum(-jnp.log1p(-u_null[:, 0]), axis=0)
                      / sigma_maj)                              # (K, N)
            # clamp the gather positions (not the comparison): beyond-exit
            # candidates are rejected by the t <= t_far test regardless of
            # the density fetched there
            xc = (s.pos[None]
                  + jnp.minimum(t_cand, t_far[None])[..., None] * s.dir[None])
            dens = volume_ops.density_at(
                scene.density, xc.reshape(-1, 3), vol).reshape(n_null, ln)
            acc = (t_cand <= t_far[None]) & (u_null[:, 1] * sigma_maj < dens)
            found = jnp.any(acc, axis=0)
            kidx = jnp.argmax(acc, axis=0)
            t = jnp.take_along_axis(t_cand, kidx[None], axis=0)[0]
            alive = ~s.done & found
            p_sc = jnp.ones((ln,), dtype)  # branch already sampled binarily
            # first-step escape <=> the transmitted-env photon survives:
            # tau0 = 0 (T0 = 1) on escape, inf (T0 = 0) on collision
            tau_first = jnp.where(found, jnp.asarray(jnp.inf, dtype),
                                  jnp.zeros((ln,), dtype))
        else:
            tau, knots = collision.query_collision_rows(scene.coll_field,
                                                        s.pos, s.dir, vol)
            if exact_entry:
                # slot 0 only (tau0 unset): exact-quadrature entry tau
                # replaces the row tau for T0 + the first-event branch;
                # knots still map the row profile's shape to distances
                tau = jnp.where(s.tau0 < 0.0, s.etau, tau)
            p_sc = -jnp.expm1(-tau)
            alive = ~s.done & (p_sc > 1e-6)
            t = collision.knots_to_distance(tau, knots, u_t)
            tau_first = tau
        # knots are baked from the bucket's voxel center, so a sampled point
        # can overshoot the box by up to a field voxel -- clamp (queries and
        # encodes expect in-box positions)
        x = jnp.clip(s.pos + t[:, None] * s.dir, ctr - half, ctr + half)

        if use_nn:
            terminate = alive & (u_rr > s.term_prob)
            scatter = alive & ~terminate
        else:
            terminate = jnp.zeros_like(alive)
            scatter = alive

        ev_w = s.weight * p_sc
        weight = jnp.where(scatter, ev_w, s.weight)
        die = jnp.zeros_like(alive)
        if not use_nn and pt.coll_weight_rr > 0.0:
            # weight Russian roulette on the CONTINUATION (unbiased: the
            # current event keeps its analytic weight; survivors divide by
            # their survival probability). The analytic per-event weight
            # prod_j p_sc decays geometrically, so without this the no-RR
            # walk drags near-zero-weight lanes through all
            # target_bounces slots.
            p_surv = jnp.clip(ev_w / pt.coll_weight_rr, 0.0, 1.0)
            die = scatter & (u_rr >= p_surv)
            weight = jnp.where(scatter & ~die,
                               ev_w / jnp.maximum(p_surv, 1e-12), weight)
        term_prob = jnp.where(scatter, s.term_prob * pt.rr_decay,
                              s.term_prob)
        new_dir = phase_ops.hg_direction_from_uniforms(u_hg1, u_hg2, s.dir,
                                                       vol.hg_g)
        dir2 = jnp.where(scatter[:, None], new_dir, s.dir)
        pos2 = jnp.where(scatter[:, None], x, s.pos)
        done = s.done | terminate | ~alive | die

        tau0 = jnp.where(s.tau0 < 0.0, tau_first, s.tau0)
        if use_nn:
            has_q = s.has_q | terminate
            q_pos = jnp.where(terminate[:, None], x, s.q_pos)
            q_dir = jnp.where(terminate[:, None], s.dir, s.q_dir)
            if cfg.quirks.query_dir_phase:
                # reference frag:785-786: the cut weight carries the HG
                # phase between the incoming dir and the PREVIOUS event's
                # incoming dir (entry dir for a cut at slot 0)
                ph = phase_ops.hg_phase(
                    jnp.sum(s.dir * -s.last_in, axis=-1), vol.hg_g)
                qw_new = ev_w * ph
            else:
                qw_new = ev_w
            q_w = jnp.where(terminate, qw_new, s.q_w)
            last_in = jnp.where(scatter[:, None], s.dir, s.last_in)
        else:
            has_q, q_pos, q_dir, q_w = s.has_q, s.q_pos, s.q_dir, s.q_w
            last_in = s.last_in

        ys = (x, s.dir, jnp.where(scatter, ev_w, 0.0))
        if ys_bf16:
            # event-collection mode ships bf16 rows anyway (the finish
            # upcasts); emitting bf16 FROM THE SCAN halves the stacked
            # output bytes -- the measured dominant step cost
            # (scripts/profile_march_ops.py: stacking, not gather/math)
            ys = tuple(y.astype(jnp.bfloat16) for y in ys)
        return S(pos2, dir2, weight, term_prob, done, tau0, has_q, q_pos,
                 q_dir, last_in, q_w, s.etau), ys

    # march split: full-width slots 0..p1-1, then pack the live lanes
    # (<= 12.5% after 3 RR-gated scatters in NN mode; weight-RR'd in no-NN
    # mode) to a fraction of the lanes for the remaining slots (O(n)
    # cumsum compaction)
    if use_nn:
        p1 = cfg.path.coll_phase1_steps
        live_frac = cfg.path.coll_live_fraction
    elif delta:
        # binary escape retires delta lanes without weight-RR, and each
        # full-width slot gathers delta_null_steps * n rows -- the split
        # pays here where it measured net-negative for collision
        p1 = cfg.path.delta_phase1_steps
        live_frac = cfg.path.delta_live_fraction
    else:
        p1 = cfg.path.coll_nonn_phase1_steps
        live_frac = (cfg.path.coll_nonn_live_fraction
                     if cfg.path.coll_weight_rr > 0.0 else 0.0)
    split = 0 < p1 < k_steps and live_frac > 0.0
    # two-phase SHADE: with prefix-packed shading the phase-2 events never
    # need full width -- shade them at the packed m1 lanes and scatter ONE
    # (m1, 3) result back, instead of writing (k2, n, 7) slot rows back
    # through k2 scatters (the overhead that made the split measure
    # net-negative in the r2 A/B, PathTraceConfig.coll_nonn_* comment)
    two_phase = (split and not collect_events
                 and cfg.path.coll_shade_cap > 0.0)
    # collect-mode split (r5, MEASURED NEGATIVE -- kept gated-off): the
    # banded renderers defer slot shading to the frame-global finish, so
    # the r2-measured writeback scatters looked avoidable the same way the
    # train walk's two_phase avoids them -- shade the PHASE-2 events here
    # at the packed m1 lanes and ship only the (n, p1) phase-1 slots to
    # the finish. NN-walk live decay at the bench pose says the lanes are
    # there ([0.646, 0.291, 0.0685, 0.0080, 0.0005] of packed width:
    # slots >= 2 are > 93% dead), but the TPU A/B
    # (scripts/profile_render_split.py, 1080p shipped point) is a LOSS at
    # every config: no-split 106.6 ms (19.45 Mrays/s) vs p1=2 frac=.125
    # 122.8 / frac=.25 134.1 / frac=.5 171.5 ms -- the repack + in-band
    # prefix_shade (which re-gathers density rows the finish's shared
    # shade would batch) costs more at render scale (518k lanes) than the
    # dead slot-rows it removes, unlike the 80k-lane train walk where the
    # same trick won 43.6 -> 34.5 ms. Parity is green
    # (test_collision_collect_split_banded_parity); render configs keep
    # coll_phase1_steps=0 so this path never runs in production.
    collect_split = (split and collect_events
                     and cfg.path.coll_shade_cap > 0.0)
    u_dim = 4 + 2 * n_null if delta else 4
    if not split:
        u_march = jax.random.uniform(jax.random.fold_in(key, 0),
                                     (k_steps, u_dim, n), dtype=dtype)
        s_fin, ys = jax.lax.scan(step, init, u_march)
    else:
        u1 = jax.random.uniform(jax.random.fold_in(key, 0),
                                (p1, u_dim, n), dtype=dtype)
        s1, ys1 = jax.lax.scan(step, init, u1)
        m1 = min(n, max(1024, int(n * live_frac)))
        sel, sel_valid = compact.compact_select(~s1.done, m1)
        sub = S(*[jnp.take(x, sel, axis=0) for x in s1])
        sub = sub._replace(done=sub.done | ~sel_valid)  # inert padding
        k2 = k_steps - p1
        # cascade split (coll_nonn_phase2_steps): a SECOND repack p2a slots
        # into phase 2 -- live decay makes most of the m1 lanes dead well
        # before the walk ends (train-target walks: 0.52% of n live at
        # global slot 8 vs the m1 cap of 6.25%), so the tail slots run at
        # m2 = live2_fraction * n lanes. Shading stays prefix-packed per
        # phase; only active in the no-NN collision prefix-shade regime.
        p2a = (pt.coll_nonn_phase2_steps
               if (two_phase and not use_nn and not delta) else 0)
        cascade = 0 < p2a < k2
        if cascade:
            u2a = jax.random.uniform(jax.random.fold_in(key, 1),
                                     (p2a, u_dim, m1), dtype=dtype)
            s2a, ys2a = jax.lax.scan(step, sub, u2a)
            m2 = min(m1, max(1024, int(n * pt.coll_nonn_live2_fraction)))
            sel2, val2 = compact.compact_select(~s2a.done, m2)
            sub2 = S(*[jnp.take(x, sel2, axis=0) for x in s2a])
            sub2 = sub2._replace(done=sub2.done | ~val2)
            u2b = jax.random.uniform(jax.random.fold_in(key, 2),
                                     (k2 - p2a, u_dim, m2), dtype=dtype)
            s2b, ys2b = jax.lax.scan(step, sub2, u2b)
            s2 = S(*[compact.scatter_update(a, sel2, val2, b)
                     for a, b in zip(s2a, s2b)])
        else:
            u2 = jax.random.uniform(jax.random.fold_in(key, 1),
                                    (k2, u_dim, m1), dtype=dtype)
            s2, ys2 = jax.lax.scan(step, sub, u2)
        s_fin = S(*[compact.scatter_update(a, sel, sel_valid, b)
                    for a, b in zip(s1, s2)])
        if two_phase or collect_split:
            ys = ys1  # phase-2 events shaded at packed width below
        else:
            back = lambda v, f: jax.vmap(
                lambda row: compact.scatter_back(n, sel, sel_valid, row,
                                                 f))(v)
            ys = tuple(jnp.concatenate([a, back(b, 0.0)], axis=0)
                       for a, b in zip(ys1, ys2))
    (ev_pos, ev_dir, ev_w) = ys  # step-major (K, N, ...); ev_w is 0 for
    # invalid slots -- slot k IS event k (every live step scatters)

    # primary see-through: T0 = exp(-tau of the camera segment)
    t0_trans = jnp.where(hit, jnp.exp(-s_fin.tau0), jnp.ones((n,), dtype))

    k_scene = jax.random.fold_in(key, k_steps + 1)

    def prefix_shade(e_pos, e_dir, e_w, lanes, k, shade_key,
                     cap_events=0.0):
        """Prefix-packed shade of step-major (k, lanes, .) events ->
        (lanes, 3) per-lane sums (collision validity is a per-lane prefix:
        a done lane never revives). The cap is a PER-LANE budget
        (coll_shade_cap events/lane on average, or `cap_events` when
        nonzero -- the phase-1 call passes coll_shade_cap_p1 because the
        global cap is degenerate at k = p1 < cap); overflow drops the
        highest lane indices, deterministically."""
        nk = k * lanes
        per_lane = cap_events or cfg.path.coll_shade_cap
        cap = min(nk, max(1024, int(lanes * per_lane)))
        w_rm = jnp.swapaxes(e_w, 0, 1)  # (lanes, k); 0 marks invalid
        packed = jnp.swapaxes(
            jnp.concatenate([e_pos, e_dir], axis=-1), 0, 1
        ).reshape(nk, 6)                                    # lane-major
        counts = jnp.sum((w_rm > 0.0).astype(jnp.int32), axis=1)
        row, slot, val_e = compact.compact_prefix(counts, cap)
        idx = row * k + jnp.minimum(slot, k - 1)
        # bf16 stacks (coll_shade_bf16) upcast HERE -- after the pack's
        # gather, so the gather itself moves half the bytes
        rows = jnp.take(packed, idx, axis=0).astype(dtype)
        w_rows = jnp.take(w_rm.reshape(nk), idx).astype(dtype)
        light = trace_scene(scene, cfg, rows[:, 0:3], rows[:, 3:6],
                            shade_key, env_samples)
        contrib = jnp.where(val_e[:, None], w_rows[:, None] * light, 0.0)
        return compact.prefix_segment_sum(contrib, counts, slot)

    if collect_events:
        scattered = jnp.zeros((n, 3), dtype=dtype)
        if collect_split:
            # phase-2 slots shade HERE at the packed m1 lanes (the finish
            # only ever sees the (n, p1) phase-1 slots); their per-lane
            # sums ride the band's rgb output into the finish composite
            sc2 = prefix_shade(*ys2, m1, k_steps - p1,
                               jax.random.fold_in(k_scene, 1))
            sc2 = jnp.where(sel_valid[:, None], sc2, 0.0)
            scattered = scattered.at[sel].add(sc2, mode="drop")
    elif cfg.path.coll_shade_cap > 0.0:
        # at target-walk scale (64 slots x 8 samples x 10k rays) the dense
        # per-slot shade is the train step's dominant cost; prefix-pack
        if two_phase:
            # phase-2 events shade at the PACKED m1 lanes; one (m1, 3)
            # scatter-add puts their sums back (sel rows are unique)
            sc1 = prefix_shade(*ys1, n, p1, k_scene,
                               cap_events=cfg.path.coll_shade_cap_p1)
            if cascade:
                sc2 = prefix_shade(*ys2a, m1, p2a,
                                   jax.random.fold_in(k_scene, 1))
                sc2b = prefix_shade(*ys2b, m2, k2 - p2a,
                                    jax.random.fold_in(k_scene, 2))
                sc2b = jnp.where(val2[:, None], sc2b, 0.0)
                sc2 = sc2.at[sel2].add(sc2b, mode="drop")
            else:
                sc2 = prefix_shade(*ys2, m1, k_steps - p1,
                                   jax.random.fold_in(k_scene, 1))
            sc2 = jnp.where(sel_valid[:, None], sc2, 0.0)
            scattered = sc1.at[sel].add(sc2, mode="drop")
        else:
            scattered = prefix_shade(ev_pos, ev_dir, ev_w, n, k_steps,
                                     k_scene)
    else:
        def shade_slot(args):
            slot_idx, e_pos, e_dir = args
            return trace_scene(scene, cfg, e_pos, e_dir,
                               jax.random.fold_in(k_scene, slot_idx),
                               env_samples)

        light = jax.lax.map(shade_slot,
                            (jnp.arange(k_steps, dtype=jnp.int32), ev_pos,
                             ev_dir))  # (K, N, 3)
        # where-mask BEFORE weighting: invalid slots (zero-filled dirs from
        # the split-march writeback) can shade to NaN, and 0 * NaN = NaN
        valid = ev_w > 0.0
        light = jnp.where(valid[..., None], light, 0.0)
        scattered = jnp.sum(ev_w[..., None] * light, axis=0)

    # the RR-cut query (and quirk phase) was recorded in the scan carry
    res = PathResult(scattered, t0_trans, s_fin.q_pos, s_fin.q_dir,
                     jnp.where(s_fin.has_q, s_fin.q_w, 0.0))
    if collect_events:
        ev = jnp.concatenate(
            [ev_pos, ev_dir, ev_w[..., None]], axis=-1)
        if cfg.volume.field_dtype == "bfloat16":
            # halve the band-output traffic; positions land within ~0.3
            # world units (< 1/6 of a tau-field voxel) and the finish
            # upcasts before shading
            ev = ev.astype(jnp.bfloat16)
        return res, jnp.swapaxes(ev, 0, 1)  # (N, K, 7) ray-major
    return res


def trace_path(scene: Scene, cfg: NRCConfig, ro: jnp.ndarray,
               rd: jnp.ndarray, key: jax.Array, use_nn: bool,
               env_samples: int | None = None,
               max_bounces: int | None = None,
               max_events: int | None = None) -> PathResult:
    """One path per ray (TracePath, nrc-forward.frag:758-822), wavefront
    style.

    TPU-native two-phase structure (replacing the fragment thread's serial
    walk with early exits):

      Phase 1 (march): a cheap masked scan that only fetches density (one
      corner-table row gather per ray-step), draws RR/scatter decisions and
      RECORDS scatter events into K per-ray slots -- positions, directions,
      previous-vertex positions, densities. No lighting, no quadrature.

      Phase 2 (shade): all expensive work runs ONCE over the (N*K) recorded
      events as flat MXU/VPU-shaped batches: per-event segment transmittance
      (32-step quadrature), direct+env lighting, and the path throughput
      reconstructed by a cumulative product over the slots (the sequential
      `transmittance *= t_r` of frag:801-804 commutes into a cumprod because
      contributions only ever see products of earlier segments).

    With Russian roulette active (use_nn) the expected event count is ~2
    (survival halves per scatter, frag:790), so K=8 slots cover the walk
    with probability 1 - 2^-28 while doing 4x less shading work than the
    masked 32-step loop. Without RR, K = max_bounces (every step can
    scatter) and the math is identical to the reference's loop.

    The cache query itself is NOT evaluated here: the RR cut records
    (query_pos, query_dir, weight = T * dirPhase, frag:785-787) and the
    caller runs one batched MLP evaluation.

    ro/rd: (N, 3).
    """
    if cfg.path.sampler in ("collision", "delta"):
        return trace_path_collision(scene, cfg, ro, rd, key, use_nn,
                                    env_samples, max_bounces)
    vol = cfg.volume
    pt = cfg.path
    if env_samples is None:
        env_samples = cfg.env_map.n_samples
    if max_bounces is None:
        max_bounces = pt.max_bounces
    if max_events is None:
        max_events = min(8, max_bounces) if use_nn else max_bounces
    n = ro.shape[0]
    k_slots = max_events
    dtype = ro.dtype

    entry, _, _ = volume_ops.entry_exit_points(ro, rd, vol.box_size,
                                               vol.box_center)

    class S(NamedTuple):
        cur_pos: jnp.ndarray     # (N, 3)
        last_pos: jnp.ndarray    # (N, 3) previous scatter vertex (or entry)
        cur_dir: jnp.ndarray     # (N, 3)
        last_dir: jnp.ndarray    # (N, 3)
        term_prob: jnp.ndarray   # (N,)
        done: jnp.ndarray        # (N,) bool
        cnt: jnp.ndarray         # (N,) int32 recorded events
        has_query: jnp.ndarray   # (N,) bool
        q_pos: jnp.ndarray       # (N, 3)
        q_dir: jnp.ndarray       # (N, 3)
        q_phase: jnp.ndarray     # (N,) dirPhase at the cut
        ev_pos: jnp.ndarray      # (N, K, 3)
        ev_prev: jnp.ndarray     # (N, K, 3)
        ev_dir: jnp.ndarray      # (N, K, 3)
        ev_dens: jnp.ndarray     # (N, K)

    zero3 = jnp.zeros((n, 3), dtype=dtype)
    entry_k = jnp.broadcast_to(entry[:, None, :], (n, k_slots, 3))
    init = S(
        cur_pos=entry, last_pos=entry, cur_dir=rd,
        last_dir=jnp.zeros_like(rd),
        term_prob=jnp.ones((n,), dtype=dtype),
        done=jnp.zeros((n,), dtype=bool),
        cnt=jnp.zeros((n,), dtype=jnp.int32),
        has_query=jnp.zeros((n,), dtype=bool),
        q_pos=entry, q_dir=rd, q_phase=jnp.zeros((n,), dtype=dtype),
        ev_pos=entry_k, ev_prev=entry_k,
        ev_dir=jnp.broadcast_to(rd[:, None, :], (n, k_slots, 3)),
        ev_dens=jnp.zeros((n, k_slots), dtype=dtype),
    )
    slot_iota = jnp.arange(k_slots, dtype=jnp.int32)[None, :]  # (1, K)

    def step(s: S, u_step):
        # all march randomness drawn in ONE batched threefry call up front
        # (32x fewer PRNG dispatches than per-step fold/split)
        u_rr, u_hg1, u_hg2, u_d = (u_step[0], u_step[1], u_step[2],
                                   u_step[3])

        density = volume_ops.density_at(scene.density, s.cur_pos, vol)
        has_density = (density > 0.0) & ~s.done

        if use_nn:
            u = u_rr
            terminate = has_density & (u > s.term_prob)
            if cfg.quirks.query_dir_phase:
                # reference frag:785-786 (see QuirkFlags.query_dir_phase)
                dir_phase = phase_ops.hg_phase(
                    jnp.sum(s.cur_dir * -s.last_dir, axis=-1), vol.hg_g)
            else:
                dir_phase = jnp.ones_like(density)
            has_query = s.has_query | terminate
            q_phase = jnp.where(terminate, dir_phase, s.q_phase)
            q_pos = jnp.where(terminate[:, None], s.cur_pos, s.q_pos)
            q_dir = jnp.where(terminate[:, None], s.cur_dir, s.q_dir)
            done = s.done | terminate
            term_prob = jnp.where(has_density & ~terminate,
                                  s.term_prob * pt.rr_decay, s.term_prob)
            scatter = has_density & ~terminate
        else:
            has_query, q_pos, q_dir, q_phase = (s.has_query, s.q_pos,
                                                s.q_dir, s.q_phase)
            done, term_prob = s.done, s.term_prob
            scatter = has_density

        # record the scatter event in slot `cnt`
        record = scatter & (s.cnt < k_slots)
        slot = (slot_iota == s.cnt[:, None]) & record[:, None]  # (N, K)
        ev_pos = jnp.where(slot[..., None], s.cur_pos[:, None, :], s.ev_pos)
        ev_prev = jnp.where(slot[..., None], s.last_pos[:, None, :],
                            s.ev_prev)
        ev_dir = jnp.where(slot[..., None], s.cur_dir[:, None, :], s.ev_dir)
        ev_dens = jnp.where(slot, density[:, None], s.ev_dens)
        cnt = s.cnt + record.astype(jnp.int32)

        last_pos = jnp.where(scatter[:, None], s.cur_pos, s.last_pos)
        last_dir = jnp.where(scatter[:, None], s.cur_dir, s.last_dir)
        new_dir = phase_ops.hg_direction_from_uniforms(u_hg1, u_hg2,
                                                       s.cur_dir, vol.hg_g)
        cur_dir = jnp.where(scatter[:, None], new_dir, s.cur_dir)

        # advance (frag:814-818): U(0, step_fraction * dist_to_exit)
        _, t_exit, _ = volume_ops.ray_aabb(s.cur_pos, cur_dir, vol.box_size,
                                           vol.box_center)
        max_dist = jnp.maximum(t_exit, 0.0) * pt.step_fraction
        cur_pos = jnp.where(done[:, None], s.cur_pos,
                            s.cur_pos + cur_dir * (u_d * max_dist)[:, None])

        return S(cur_pos, last_pos, cur_dir, last_dir, term_prob, done, cnt,
                 has_query, q_pos, q_dir, q_phase, ev_pos, ev_prev, ev_dir,
                 ev_dens), None

    two_phase = (use_nn and pt.march_phase1_steps > 0
                 and max_bounces > pt.march_phase1_steps
                 and pt.transmittance_mode == "field")
    if not two_phase:
        u_march = jax.random.uniform(jax.random.fold_in(key, 0),
                                     (max_bounces, 4, n), dtype=dtype)
        s, _ = jax.lax.scan(step, init, u_march)
    else:
        # Two-phase march: most rays cross the cloud within a few steps and
        # then wander in empty box space (measured: <=10% have any optical
        # depth ahead after step 6 at reference scenes). Phase 1 runs
        # full-width; rays with tau(cur -> exit) == 0 can never scatter,
        # query, or change t_final again, so the survivors are compacted to
        # `march_live_fraction` lanes for the remaining steps and scattered
        # back. Live rays beyond the cap keep their phase-1 state (same
        # deterministic-cap caveat as event compaction; the cap sits ~2x
        # above the measured survivor fraction).
        from neuralradiancecaching_tpu.ops import compact, lightfield
        p1 = pt.march_phase1_steps

        # phase 0: rays with zero optical depth at ENTRY can never scatter
        # at all -- they come out as env see-through (cnt=0, t_final=1)
        # without marching. One tau gather over all rays.
        m0 = (min(n, max(1024, int(n * pt.march_entry_fraction)))
              if pt.march_entry_fraction > 0 else n)
        if m0 < n:
            tau0 = lightfield.query_tau_field(scene.env_t_field, entry, rd,
                                              vol)
            sel0, val0 = compact.compact_select(tau0 > 1e-4, m0)
            sub = S(*[jnp.take(x, sel0, axis=0) for x in init])
            sub = sub._replace(done=sub.done | ~val0)
        else:
            sel0 = None
            sub = init

        u1 = jax.random.uniform(jax.random.fold_in(key, 0),
                                (p1, 4, m0), dtype=dtype)
        sub, _ = jax.lax.scan(step, sub, u1)
        tau_ahead = lightfield.query_tau_field(scene.env_t_field,
                                               sub.cur_pos, sub.cur_dir, vol)
        live = ~sub.done & (tau_ahead > 1e-4)
        m1 = min(m0, max(1024, int(n * pt.march_live_fraction)))
        sel1, val1 = compact.compact_select(live, m1)
        sub2 = S(*[jnp.take(x, sel1, axis=0) for x in sub])
        sub2 = sub2._replace(done=sub2.done | ~val1)
        u2 = jax.random.uniform(jax.random.fold_in(key, 1),
                                (max_bounces - p1, 4, m1), dtype=dtype)
        sub2, _ = jax.lax.scan(step, sub2, u2)
        sub = S(*[compact.scatter_update(x, sel1, val1, y)
                  for x, y in zip(sub, sub2)])
        if sel0 is not None:
            s = S(*[compact.scatter_update(x, sel0, val0, y)
                    for x, y in zip(init, sub)])
        else:
            s = sub

    # ---- Phase 2: shade the recorded events ----
    valid = slot_iota < s.cnt[:, None]  # (N, K)
    k_scene = jax.random.fold_in(key, max_bounces + 1)

    def _segment_t(a, b):
        if pt.transmittance_mode == "field":
            from neuralradiancecaching_tpu.ops import lightfield
            return lightfield.segment_transmittance_field(
                scene.env_t_field, a, b, vol)
        return volume_ops.transmittance(scene.density, a, b,
                                        pt.transmittance_steps, vol)

    if use_nn and cfg.path.compact_events > 0:
        # Cross-ray compaction: with Russian roulette only ~1.6-2.2 of the K
        # slots per ray are real events, so sort the valid events to the
        # front and shade a capped dense batch. Unselected slots keep
        # t_r = 1 / light = 0, which is exactly what an invalid slot
        # contributes. Overflow beyond the cap is NOT noise: dropped valid
        # events lose their light AND have t_r forced to 1 (inflating the
        # final transmittance), and the stable argsort concentrates drops on
        # the highest-index rays -- hence the config-level validation that
        # compact_events sits well above the RR-implied mean
        # (config.PathTraceConfig.__post_init__).
        from neuralradiancecaching_tpu.ops import compact
        nk = n * k_slots
        cap = min(nk, max(1024, int(n * cfg.path.compact_events)))
        packed = jnp.concatenate(
            [s.ev_pos, s.ev_prev, s.ev_dir, s.ev_dens[..., None]],
            axis=-1).reshape(nk, 10)
        flat_valid = valid.reshape(nk)
        sel, sel_valid = compact.compact_select(flat_valid, cap)
        rows = jnp.take(packed, sel, axis=0)
        t_r_sel = _segment_t(rows[:, 0:3], rows[:, 3:6])
        light_sel = trace_scene(scene, cfg, rows[:, 0:3], rows[:, 6:9],
                                k_scene, env_samples)
        t_r = compact.scatter_back(
            nk, sel, sel_valid, jnp.where(sel_valid, t_r_sel, 1.0),
            1.0).reshape(n, k_slots)
        light = compact.scatter_back(
            nk, sel, sel_valid,
            jnp.where(sel_valid[:, None], light_sel, 0.0),
            0.0).reshape(n, k_slots, 3)
    else:
        # dense per-slot shading, sequential over K (lax.map) so transient
        # quadrature buffers stay O(N * steps), not O(N * K * steps)
        def shade_slot(args):
            slot_idx, ev_pos, ev_prev, ev_dir = args
            t_r = _segment_t(ev_pos, ev_prev)
            light = trace_scene(scene, cfg, ev_pos, ev_dir,
                                jax.random.fold_in(k_scene, slot_idx),
                                env_samples)
            return t_r, light

        slots = (jnp.arange(k_slots, dtype=jnp.int32),
                 jnp.swapaxes(s.ev_pos, 0, 1), jnp.swapaxes(s.ev_prev, 0, 1),
                 jnp.swapaxes(s.ev_dir, 0, 1))
        t_r_k, light_k = jax.lax.map(shade_slot, slots)  # (K, N), (K, N, 3)
        t_r = jnp.where(valid, jnp.swapaxes(t_r_k, 0, 1), 1.0)  # (N, K)
        light = jnp.swapaxes(light_k, 0, 1)  # (N, K, 3)

    t_incl = jnp.cumprod(t_r, axis=1)  # (N, K) throughput AFTER event k
    t_before = jnp.concatenate(
        [jnp.ones((n, 1), dtype=dtype), t_incl[:, :-1]], axis=1)
    contrib = (valid * t_before * s.ev_dens)[..., None] * light
    scattered = jnp.sum(contrib, axis=1)

    # throughput at the final state: product over all recorded events --
    # the reference's `transmittance` both at the RR cut (frag:786) and at
    # loop end (frag:821)
    t_at = jnp.concatenate([jnp.ones((n, 1), dtype=dtype), t_incl], axis=1)
    t_final = jnp.take_along_axis(t_at, jnp.minimum(s.cnt, k_slots)[:, None],
                                  axis=1)[:, 0]
    q_w = jnp.where(s.has_query, t_final * s.q_phase, 0.0)

    return PathResult(scattered, t_final, s.q_pos, s.q_dir, q_w)


def shade_deferred(cfg: NRCConfig) -> bool:
    """True when band shading is deferred to the frame-global finish pass:
    collision-or-delta sampler + deterministic 'field' light modes (the
    deferred shade draws no randomness, so moving it out of the bands is
    exact; both samplers record prefix-shaped (pos, dir, weight) events)."""
    return (cfg.path.sampler in ("collision", "delta")
            and cfg.path.defer_shade
            and cfg.env_map.in_scatter_mode == "field"
            and cfg.path.transmittance_mode == "field")


def render_band_deferred(scene: Scene, cfg: NRCConfig, ro: jnp.ndarray,
                         rd: jnp.ndarray, key: jax.Array,
                         entry_tau: jnp.ndarray | None = None):
    """Band-local render work with the cache query -- and, in collision
    mode, ALL event shading -- DEFERRED to the caller.

    Query (and scatter-event) fractions are wildly non-uniform across row
    bands (measured 0.00 in sky bands vs 0.40 in cloud-center bands against
    a 0.14 frame mean), so a per-band cap either over-provisions sky bands
    or silently drops work exactly where the cloud is. Banded callers
    therefore run the march per band and compact the recorded queries and
    events GLOBALLY across the frame: slots flow to the bands that need
    them and the caps sit just above the frame-mean fractions with zero
    drops.

    Returns (rgb_without_cache, trans, query_pos, query_dir, query_weight,
    events (N, K, 7)); K = 0 when shading already happened in-band.

    Each input ray is traced at ONE sample regardless of cfg.render.spp;
    banded callers implement spp > 1 by expanding rays into spp virtual
    copies with distinct band keys and averaging after the global finish
    (render.tiled._bands_program) -- the in-program multi-spp frame of the
    reference's TracePathMultiple, nrc-forward.frag:824-834.
    """
    if shade_deferred(cfg):
        res, ev = trace_path_collision(scene, cfg, ro, rd, key, use_nn=True,
                                       collect_events=True,
                                       entry_tau=entry_tau)
    else:
        res = trace_path(scene, cfg, ro, rd, key, use_nn=True)
        ev = jnp.zeros((ro.shape[0], 0, 7), dtype=ro.dtype)
    q_w = (jnp.zeros_like(res.query_weight) if cfg.render.show_non_nn
           else res.query_weight)
    return (res.scattered, res.transmittance, res.query_pos, res.query_dir,
            q_w, ev)


def shade_and_query(scene: Scene, cfg: NRCConfig, rgb: jnp.ndarray,
                    q_pos: jnp.ndarray, q_dir: jnp.ndarray,
                    q_w: jnp.ndarray, query_fn: QueryFn,
                    events: Optional[jnp.ndarray] = None,
                    cap_n: Optional[int] = None) -> jnp.ndarray:
    """Frame-global compacted event shade (collision mode) + compacted
    cache query, WITHOUT the env composite (shared by finish_deferred and
    the packed-live-ray pipeline). Returns rgb (N, 3).

    cap_n: base count for the shade/query cap fractions (the FULL frame
    size in the packed pipeline, where n is only the packed width) --
    keeps the probed cap fractions frame-relative."""
    from neuralradiancecaching_tpu.ops import compact

    n = rgb.shape[0]
    base = cap_n if cap_n is not None else n

    if events is not None and events.shape[1] > 0:
        # deferred event shading: collision-walk validity is PREFIX-shaped
        # per ray (a done lane never revives), so the frame-wide pack is a
        # counts/offsets prefix pack (compact_prefix) and the un-pack
        # reduction a segmented scan (prefix_segment_sum, ~3x cheaper than
        # even the sorted segment_sum it replaced) -- vs a general
        # n*k-slot compaction + random scatter-add at 1080p scale
        k = events.shape[1]
        slot0_dense = cfg.render.shade_slot0_dense and k > 1
        if slot0_dense:
            # slot 0 (~83% live under the packed pipeline) shades DENSE:
            # a contiguous slice instead of the pack's event-row gather,
            # a plain add instead of its segmented sum. Only the tail
            # slots (1..k-1, ~0.47 events/lane) go through the pack, at
            # a shade_cap_fraction budgeting just them.
            rows0 = events[:, 0, :].astype(rgb.dtype)
            w0 = rows0[:, 6]
            light0 = trace_scene(scene, cfg, rows0[:, 0:3], rows0[:, 3:6],
                                 jax.random.PRNGKey(0),
                                 cfg.env_map.n_samples)
            # mask BEFORE weighting: empty slots carry zero-filled dirs
            # that can shade to NaN, and 0 * NaN = NaN
            rgb = rgb + jnp.where((w0 > 0.0)[:, None],
                                  w0[:, None] * light0, 0.0)
            events = events[:, 1:, :]
            k = k - 1
        flat = events.reshape(n * k, 7)
        w_nk = events[:, :, 6]                              # (n, k)
        counts = jnp.sum((w_nk > 0.0).astype(jnp.int32), axis=1)
        cap_e = min(n * k,
                    max(1024, int(base * cfg.render.shade_cap_fraction)))
        row, slot, val_e = compact.compact_prefix(counts, cap_e)
        idx = row * k + jnp.minimum(slot, k - 1)
        rows = jnp.take(flat, idx, axis=0).astype(rgb.dtype)  # bf16 upcast
        light = trace_scene(scene, cfg, rows[:, 0:3], rows[:, 3:6],
                            jax.random.PRNGKey(0),  # field modes: unused
                            cfg.env_map.n_samples)
        contrib = jnp.where(val_e[:, None], rows[:, 6:7] * light, 0.0)
        rgb = rgb + compact.prefix_segment_sum(contrib, counts, slot)

    frac = cfg.render.query_cap_fraction
    has_q = q_w > 0.0
    # the hash encode at full frame width exceeds the axon compile helper's
    # program limit (measured: 26k-row encodes compile, 388k crash), so the
    # compacted queries are evaluated in fixed-size lax.map chunks; the
    # chunk size is the gather-op-count lever (RenderConfig.query_chunk)
    chunk = cfg.render.query_chunk
    # MLP hoist (RenderConfig.query_split_mlp): only the GATHER half of
    # the query (encode_fn) needs chunking for the compile helper; the
    # MLP is one plain matmul, so running it per 32k chunk leaves the MXU
    # ~99% idle. When the query_fn carries the encode/MLP split
    # (nrc.make_baked_query_fn), map the encode over chunks and run the
    # MLP ONCE over all feature rows.
    enc_fn = getattr(query_fn, "encode_fn", None)
    mlp_fn = getattr(query_fn, "mlp_fn", None)
    split_mlp = (cfg.render.query_split_mlp and enc_fn is not None
                 and mlp_fn is not None)

    def chunked_query(p, d, m):
        """(m, 3),(m, 3) -> (m, 3), m a multiple of chunk."""
        ab = (p.reshape(-1, chunk, 3), d.reshape(-1, chunk, 3))
        if split_mlp:
            feats = jax.lax.map(lambda pd: enc_fn(pd[0], pd[1]), ab)
            return mlp_fn(feats.reshape(m, feats.shape[-1]))
        return jax.lax.map(
            lambda pd: query_fn(pd[0], pd[1]), ab).reshape(m, 3)

    if frac < 1.0:
        capq = min(n, max(1024, int(base * frac)))
        if capq > chunk:  # round up to whole chunks; capq may exceed n
            # (compact_select pads past-count slots, <= chunk-1 wasted
            # rows) -- clamping to a non-multiple n would force one
            # full-width query call, which the compile helper rejects
            capq = -(-capq // chunk) * chunk
        sel, sel_valid = compact.compact_select(has_q, capq)
        qsel_p = jnp.take(q_pos, sel, axis=0)
        qsel_d = jnp.take(q_dir, sel, axis=0)
        if capq > chunk and capq % chunk == 0:
            cache_sel = chunked_query(qsel_p, qsel_d, capq)
        else:
            cache_sel = query_fn(qsel_p, qsel_d)
        cache_sel = jnp.where(sel_valid[:, None], cache_sel, 0.0)
        cache = compact.scatter_back(n, sel, sel_valid, cache_sel, 0.0)
    elif n > chunk:
        # uncapped full-width query, chunked for the compile helper's
        # program limit: no compaction pack, no scatter_back, and ZERO
        # dropped queries -- a candidate win when most lanes query (the
        # packed pipeline: ~69% of live lanes reach the RR cut, so the
        # extra non-querying chunk rows can cost less than the
        # frame-width compact_select + takes + scatter_back they replace;
        # A/B via query_cap_fraction=1.0, docs/PERFORMANCE.md)
        pad = -n % chunk
        qp_p = jnp.concatenate([q_pos, jnp.zeros((pad, 3), q_pos.dtype)])
        qd_p = jnp.concatenate([q_dir, jnp.zeros((pad, 3), q_dir.dtype)])
        cache = chunked_query(qp_p, qd_p, n + pad)[:n]
        cache = jnp.where(has_q[:, None], cache, 0.0)
    else:
        cache = jnp.where(has_q[:, None], query_fn(q_pos, q_dir), 0.0)
    return rgb + q_w[:, None] * cache


def finish_deferred(scene: Scene, cfg: NRCConfig, ro: jnp.ndarray,
                    rd: jnp.ndarray, rgb: jnp.ndarray, trans: jnp.ndarray,
                    q_pos: jnp.ndarray, q_dir: jnp.ndarray,
                    q_w: jnp.ndarray, query_fn: QueryFn,
                    events: Optional[jnp.ndarray] = None,
                    env_rgb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Global finish for deferred bands: shade_and_query + the env
    miss/see-through composite (frag:848-864). Returns final rgb (N, 3).

    env_rgb: optional precomputed direct env radiance per pixel. The env
    composite depends only on the (static) env map and the frame's ray
    directions, so progressive runs with a fixed camera hoist it out of
    the per-frame program (measured 45.7 ms/frame at 1080p for the 2M-row
    bilinear env gather, scripts/profile_finish.py)."""
    rgb = shade_and_query(scene, cfg, rgb, q_pos, q_dir, q_w, query_fn,
                          events)

    env_color = (env_rgb if env_rgb is not None
                 else envmap_ops.sample_direct(scene.env, rd, hpm=False))
    if cfg.path.sampler in ("collision", "delta"):
        # analytic primary see-through: trans is T0 = exp(-tau_0) (1 for
        # misses; 'delta' samples the same quantity binarily with
        # E[trans] = T0), so the env composite is exact instead of the
        # reference's binary transmittance==1 test
        return rgb + trans[:, None] * env_color
    _, _, hit = volume_ops.ray_aabb(ro, rd, cfg.volume.box_size,
                                    cfg.volume.box_center)
    see_through = trans >= 1.0
    return jnp.where((~hit | see_through)[:, None], env_color, rgb)


def render_image(scene: Scene, cfg: NRCConfig, ro: jnp.ndarray,
                 rd: jnp.ndarray, key: jax.Array,
                 query_fn: Optional[QueryFn] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full render pass (nrc-forward.frag main, :837-870): spp-averaged path
    trace, cache queries batched post-scan, env-map miss/see-through logic.

    Returns (rgb (N, 3), transmittance (N,)).
    """
    use_nn = cfg.render.use_nn and query_fn is not None
    n = ro.shape[0]

    def one_sample(k):
        res = trace_path(scene, cfg, ro, rd, k, use_nn=use_nn)
        rgb = res.scattered
        if use_nn and not cfg.render.show_non_nn:
            frac = cfg.render.query_cap_fraction
            if frac < 1.0:
                # query compaction: the hash-encode + MLP (the dominant
                # 128-gathers-per-ray cost) runs only on querying rays,
                # packed to the front; see RenderConfig.query_cap_fraction.
                # Chunked like finish_deferred: a >~64k-row hash encode in
                # one program exceeds the remote compile helper's limit.
                from neuralradiancecaching_tpu.ops import compact
                chunk = cfg.render.query_chunk
                capq = min(n, max(1024, int(n * frac)))
                if capq > chunk:  # whole chunks; may exceed n (see
                    # shade_and_query -- compact_select pads)
                    capq = -(-capq // chunk) * chunk
                has_q = res.query_weight > 0.0
                sel, sel_valid = compact.compact_select(has_q, capq)
                qsel_p = jnp.take(res.query_pos, sel, axis=0)
                qsel_d = jnp.take(res.query_dir, sel, axis=0)
                if capq > chunk and capq % chunk == 0:
                    # MLP hoist (see shade_and_query): chunk the gathers,
                    # run the matmuls once over all rows
                    enc_fn = getattr(query_fn, "encode_fn", None)
                    mlp_fn = getattr(query_fn, "mlp_fn", None)
                    ab = (qsel_p.reshape(-1, chunk, 3),
                          qsel_d.reshape(-1, chunk, 3))
                    if (cfg.render.query_split_mlp and enc_fn is not None
                            and mlp_fn is not None):
                        feats = jax.lax.map(
                            lambda pd: enc_fn(pd[0], pd[1]), ab)
                        cache_sel = mlp_fn(
                            feats.reshape(capq, feats.shape[-1]))
                    else:
                        cache_sel = jax.lax.map(
                            lambda pd: query_fn(pd[0], pd[1]),
                            ab).reshape(capq, 3)
                else:
                    cache_sel = query_fn(qsel_p, qsel_d)
                cache_sel = jnp.where(sel_valid[:, None], cache_sel, 0.0)
                cache = compact.scatter_back(n, sel, sel_valid, cache_sel,
                                             0.0)
            else:
                cache = query_fn(res.query_pos, res.query_dir)
            rgb = rgb + res.query_weight[:, None] * cache
        return rgb, res.transmittance

    spp = cfg.render.spp
    if spp == 1:
        rgb, trans = one_sample(key)
    else:
        keys = jax.random.split(key, spp)
        rgbs, transs = jax.lax.map(one_sample, keys)
        rgb, trans = jnp.mean(rgbs, axis=0), jnp.mean(transs, axis=0)

    # miss & see-through -> direct env map (frag:848-864); in collision
    # mode the primary escape is analytic: rgb += T0 * env
    env_color = envmap_ops.sample_direct(scene.env, rd, hpm=False)
    if cfg.path.sampler in ("collision", "delta"):
        rgb = rgb + trans[:, None] * env_color
    else:
        _, _, hit = volume_ops.ray_aabb(ro, rd, cfg.volume.box_size,
                                        cfg.volume.box_center)
        see_through = trans >= 1.0
        rgb = jnp.where((~hit | see_through)[:, None], env_color, rgb)
    return rgb, trans
