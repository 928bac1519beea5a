"""Typed configuration dataclasses for every workload.

The reference has no config system at all -- hyperparameters are literals in
``src/main.cpp:109-166``, shader ``#define``s and UBO fields (SURVEY.md §5).
Here every tunable is a frozen dataclass field; the five BASELINE.json configs
are exposed as preset constructors at the bottom.

All defaults mirror the reference's values, with the "quirks" (known reference
bugs, SURVEY.md §2) FIXED by default and re-enableable through
:class:`QuirkFlags` for bit-fidelity experiments.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Tuple


@dataclass(frozen=True)
class QuirkFlags:
    """Opt-in reproductions of reference bugs (SURVEY.md §2 'quirks').

    Each flag defaults to False = fixed math. Set True to reproduce the
    reference's exact (buggy) behaviour.
    """

    # MRHE trilinear lerp factors use world-pos minus grid-space corner
    # (reference nrc-train.comp:312) instead of the fixed resPos - floorPos.
    world_space_lerp: bool = False
    # BackpropMrhe reads feature-0's error for both features
    # (reference nrc-train.comp:960).
    duplicated_feature_grad: bool = False
    # One-blob evaluates N(i; x, 1/4) with x in [0,1] and i in 0..15 so only
    # the first bins ever fire (reference nrc-train.comp:352-365); the fixed
    # version evaluates N(i; K*x, K/4) spreading support over all bins, and
    # maps phi to [0,1] instead of the reference's [0.5, 1.5].
    raw_oneblob: bool = False
    # Density volume quantized to 8 bits on upload (reference Texture3D.cpp:32).
    quantize_density_8bit: bool = False
    # Env-map importance sample direction uses the reference's non-normalized
    # sin(theta*pi)*(cos, 1, sin) formula (nrc-forward.frag:736) instead of
    # the correct spherical direction.
    raw_envmap_dir: bool = False
    # At the Russian-roulette cut the reference scales the cache query by
    # hg_phase(dot(currentDir, -lastDir)) (nrc-forward.frag:785-786) -- but
    # the cache is trained on UNWEIGHTED path radiance from that very
    # (pos, dir) and every other vertex uses phase=1 (the 'importance
    # sampling' convention, frag:797). The factor systematically dims the
    # cached tail ~15x for forward-scattered paths. Fixed default: weight 1.
    query_dir_phase: bool = False


@dataclass(frozen=True)
class MLPConfig:
    """The radiance-cache MLP: 64->64 x5 -> 3, ReLU everywhere (incl. output).

    Mirrors reference NeuralRadianceCache.cpp:412-426 (weight shapes) and
    nrc-forward.frag:482-489 (output ReLU). Weight init N(0,1)*0.01
    (NeuralRadianceCache.cpp:629-645); biases zero (the reference never
    initializes them -- quirk #1 fixed here, `// TODO: init biases`
    NeuralRadianceCache.cpp:699).
    """

    in_features: int = 64
    hidden: int = 64
    out_features: int = 3
    n_layers: int = 6  # 5 hidden matmuls + 1 output matmul
    weight_init_std: float = 0.01
    output_relu: bool = True
    # 'relu' is the live reference path; 'sigmoid' resurrects the commented
    # alternative (nrc-forward.frag:441-488) and the vestigial compute-lib's
    # SigmoidLayer (include/engine/compute/SigmoidLayer.hpp)
    activation: str = "relu"
    # inference (query) forward through the fused Pallas kernel
    # (ops/pallas_mlp.py): all six layers with VMEM-resident weights and no
    # HBM activation round-trips -- the TPU counterpart of the reference's
    # fully-fused ApplyWeights0-5 (nrc-forward.frag:503-534). Training
    # gradients always use the jnp path. Falls back to jnp off-TPU.
    # MEASURED A/B @1080p bench settings (518k queries/frame): jnp wins by
    # ~1% (1555 vs 1570 ms) -- the query phase is gather-bound, and XLA
    # fuses the six tiny matmuls well on its own -- so the default is OFF.
    # The kernel remains the right primitive when the MLP dominates
    # (standalone 113 Mqueries/s, ~24x the query phase's effective rate).
    fused_inference: bool = False
    # query-path compute dtype: 'bfloat16' runs the lerp weights, one-blob
    # encode and MLP matmuls in bf16 (the hash INDEX math and lerp
    # fractions stay f32 -- bf16's 8 mantissa bits would wreck fine-level
    # fractions). Measured: 3.11 -> 2.86 ms per 32k query chunk; output
    # rel err vs f32 mean 0.05% / p99 0.25% -- far below the converged
    # cache's own 2.9% binned error (docs/PERFORMANCE.md). Training is
    # unaffected (always f32). Default conservative f32; bench.py selects
    # bf16 (BENCH_QUERY_DTYPE=float32 restores the A/B leg).
    inference_dtype: str = "float32"


@dataclass(frozen=True)
class OptimizerConfig:
    """Momentum-SGD with the reference's NaN/clip guard.

    Semantics of nrc-step.comp:205-236: m = (1-b1)*(guard(-g) - wd*w) + b1*m;
    w += lr*m; non-finite or |w|>1000 weights reset to 0.
    Defaults: lr=0.001, wd=0, beta1=0.5 (src/main.cpp:156).
    """

    learning_rate: float = 0.001
    weight_decay: float = 0.0
    beta1: float = 0.5
    clip_border: float = 1000.0
    reset_border: float = 1000.0
    # 'momentum' = the reference's guarded momentum-SGD (nrc-step.comp);
    # 'adam' = guarded Adam (ops/optimizers.py:adam_step) -- the
    # radiance-cache/Instant-NGP standard the reference lacks. beta2/eps
    # are Adam-only (beta1 doubles as Adam's first-moment decay; set it
    # to 0.9 when switching kinds).
    kind: str = "momentum"
    beta2: float = 0.99
    eps: float = 1e-15
    # exponential lr decay (Adam only -- keyed off the state's opt_step
    # counter): effective lr = learning_rate * lr_decay_factor ^
    # (step / lr_decay_steps). 0 disables. Smooth (per-step) rather than
    # staircase so jitted programs stay step-count-agnostic.
    lr_decay_steps: int = 0
    lr_decay_factor: float = 0.5


@dataclass(frozen=True)
class MRHEConfig:
    """Multiresolution hash encoding (Instant-NGP style).

    L=16 levels, T=16384 entries, F=2 features, Nmin=16, Nmax=512 with a
    geometric resolution schedule (reference MRHE.cpp:80-121); init
    N(0,1)*0.1 (MRHE.cpp:127-144); plain-SGD optimizer lr=0.01
    (src/main.cpp:157) with clip border 100 (mrhe-step.comp:34).
    """

    n_levels: int = 16
    table_size: int = 16384
    n_features: int = 2
    min_res: int = 16
    max_res: int = 512
    init_std: float = 0.1
    learning_rate: float = 0.01
    weight_decay: float = 0.0
    clip_border: float = 100.0
    reset_border: float = 1000.0
    # hash-table optimizer: 'sgd' = the reference's guarded plain SGD
    # (mrhe-step.comp); 'adam' = guarded sparse Adam (zero-grad rows keep
    # their moments/params -- the Instant-NGP recipe for hash grids).
    optimizer: str = "sgd"
    beta1: float = 0.9
    beta2: float = 0.99
    eps: float = 1e-15
    # exponential lr decay (Adam only; see OptimizerConfig.lr_decay_steps)
    lr_decay_steps: int = 0
    lr_decay_factor: float = 0.5
    n_dims: int = 3  # 3 for volume positions, 2 for image fit
    # inference fast path: levels with res <= dense_max_res are baked into
    # dense corner-packed grids after each optimizer step (1 row gather per
    # level per query instead of 8 hash gathers; ops/mrhe.py). Memory is
    # sum (r+2)^3 * 8F floats over dense levels: 64 -> ~50 MB, 128 ->
    # ~290 MB (v5e has 16 GB HBM). MEASURED A/B: standalone
    # (scripts/profile_query.py, 393k queries) 128 saves 24 ms of query for
    # 8 ms more bake -- but in the FULL banded frame 128 is ~85 ms SLOWER
    # (730 vs 646 ms, scripts/profile_bf16.py) -- the per-frame bake and
    # bigger tables lose more than the query saves. Default stays 64.
    dense_max_res: int = 64
    # TRAIN-path encode: 'oct' gathers ONE corner-packed row per level
    # (2^D rolls rebuild the rows per step, ~1 ms) and backprops through an
    # oct-layout scatter-add with 2^D x fewer rows (ops/mrhe.py
    # encode_oct_train; fwd bit-pattern equals the hash path, grads equal
    # up to fp add order). 'hash' keeps the 8-gathers-per-level path
    # (automatic fallback when table_size is not a power of two).
    # MEASURED at the 10k train batch: grads+step 38.3 -> see r4 ledger.
    train_encode: str = "oct"
    # which baked inference representation nrc.bake builds (ops/mrhe.py):
    #   'oct'   -- corner-packed hash rows, ONE row gather per level for
    #              every level (bit-exact; needs power-of-two table_size;
    #              measured 4.4x faster than 'dense' at 393k queries and the
    #              bake is ~4 ms vs 39 ms -- scripts/profile_oct.py)
    #   'dense' -- r2 dense grids for levels with res <= dense_max_res plus
    #              8-gather hash tail (kept for A/B)
    #   'none'  -- no bake; query_baked == query (pure hash path)
    inference_bake: str = "oct"

    def __post_init__(self):
        if self.inference_bake not in ("oct", "dense", "none"):
            raise ValueError(f"inference_bake={self.inference_bake!r}")
        if (self.inference_bake == "oct"
                and self.table_size & (self.table_size - 1) != 0):
            raise ValueError("inference_bake='oct' needs a power-of-two "
                             f"table_size, got {self.table_size}")

    @property
    def n_outputs(self) -> int:
        return self.n_levels * self.n_features


@dataclass(frozen=True)
class OneBlobConfig:
    """One-blob direction encoding: 16 Gaussian bins each for theta and phi.

    Reference nrc-train.comp:352-365 (sigma = 1/4).
    """

    n_bins: int = 16
    sigma: float = 0.25

    @property
    def n_outputs(self) -> int:
        return 2 * self.n_bins


@dataclass(frozen=True)
class VolumeConfig:
    """The density volume and its world-space AABB.

    The reference volume is 125x85x153 raw fp32 (src/main.cpp:123) in a box of
    full size (125,85,153)/2 centered at the origin (skySize const,
    nrc-train.comp:212 + sky_sdf :368-372), i.e. 0.5 world units per voxel.
    densityFactor/g defaults from VolumeData.cpp:82-89.
    """

    grid_shape: Tuple[int, int, int] = (125, 85, 153)  # (x, y, z) voxels
    box_size: Tuple[float, float, float] = (62.5, 42.5, 76.5)
    box_center: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    density_factor: float = 0.4
    hg_g: float = 0.7
    # storage dtype of the baked light/collision fields (tau, env scatter,
    # collision rows): 'float32' or 'bfloat16'. The march/shade gathers are
    # HBM-latency-bound at 16-48B rows, so bf16 halves the gathered bytes;
    # queries upcast after the gather. ~0.4% relative error on tau/radiance.
    field_dtype: str = "float32"
    # voxel resolution of ALL baked light/collision fields (tau, env
    # scatter, collision); production default from the r2 sweep. Small
    # values make the bakes cheap enough for the virtual-CPU mesh dryrun
    # to exercise the SHIPPED collision pipeline (VERDICT r2 item 6).
    field_shape: Tuple[int, int, int] = (32, 24, 40)
    # (theta, phi) direction-bucket resolution of the tau + collision
    # fields (~11-deg bins at the default). THE dominant baked-field bias
    # knob (measured vs the unbiased delta sampler on the cloud scene,
    # scripts/profile_bias_knobs.py): (16, 32) -> +5.2% mean radiance /
    # 9.4% noise-sub image RMSE; (32, 64) -> +2.0% / 5.3% at 4x the field
    # memory + bake time (query cost unchanged: same row size). Finer
    # VOXELS barely move it; CDF knots help only the mean.
    field_dir_buckets: Tuple[int, int] = (16, 32)
    # (theta, phi) OUT-direction bucket resolution of the HG-convolved
    # scatter field (and the premultiplied radiance field): the query-side
    # bilinear grid over the event's outgoing direction. Real render
    # events cluster their directions where the HG-sun lobe peaks, so
    # 22-deg bins under-resolve exactly there: measured -5.5% mean field
    # error at event-weighted render events vs -1.1% at uniform dirs
    # (scripts/profile_sfield_events.py). Row size (12) and query cost are
    # bucket-count-independent; memory/bake scale linearly with the count.
    field_out_buckets: Tuple[int, int] = (8, 16)


@dataclass(frozen=True)
class CameraConfig:
    """Perspective camera (GLM semantics: RH, depth -1..1).

    Defaults from src/main.cpp:142-149: pos (0,0,-64), view +z, up +y,
    fov 60 deg, near 0.1, far 100.
    """

    position: Tuple[float, float, float] = (0.0, 0.0, -64.0)
    view_dir: Tuple[float, float, float] = (0.0, 0.0, 1.0)
    up: Tuple[float, float, float] = (0.0, 1.0, 0.0)
    fov_deg: float = 60.0
    aspect: float = 1.0
    near: float = 0.1
    far: float = 100.0


@dataclass(frozen=True)
class DirLightConfig:
    """Directional light (reference DirLight.cpp:5-14; default strength 0,
    zenith -1.57, azimuth 0, white -- src/main.cpp:151)."""

    zenith: float = -1.57
    azimuth: float = 0.0
    color: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    strength: float = 0.0
    enabled: bool = False  # static: compile the light path at all?


@dataclass(frozen=True)
class PointLightConfig:
    """Point light (reference PointLight.cpp; default origin/white/strength 0,
    src/main.cpp:152)."""

    position: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    color: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    strength: float = 0.0
    enabled: bool = False


@dataclass(frozen=True)
class EnvMapConfig:
    """HDR environment map strengths (reference HdrEnvMap.cpp:108)."""

    direct_strength: float = 1.0
    hpm_strength: float = 8.0
    # number of phase-sampled env rays per scatter vertex in the render pass
    # (reference nrc-forward.frag:753 uses 8)
    n_samples: int = 8
    # steps of transmittance quadrature per env sample (nrc-forward.frag:721)
    transmittance_steps: int = 16
    # fraction of env samples drawn by inverse-CDF importance sampling.
    # The reference declares a 50/50 split but its loop bound makes the
    # CDF branch dead code (nrc-forward.frag:715 halfSampleCount==sampleCount);
    # 0.0 reproduces that; 0.5 enables the two-strategy sampler for real.
    cdf_fraction: float = 0.0
    # exit-transmittance evaluation per env sample:
    #   'field'      -- precomputed T(voxel, dir) lookup, one row gather
    #                   (ops/lightfield.py; fast TPU path, default)
    #   'quadrature' -- the reference's per-sample 16-step quadrature
    #                   (nrc-forward.frag:721; exact but 16x the gathers)
    #   'ratio'      -- UNBIASED ratio tracking (ops/volume.py
    #                   transmittance_ratio; PathTraceConfig.
    #                   ratio_tracking_steps candidates, one batched
    #                   gather) -- the ground-truth mode for parity runs
    transmittance_mode: str = "field"
    # env in-scatter estimator at scatter vertices:
    #   'mc'    -- the reference's n_samples phase-sampled MC estimate
    #              (nrc-forward.frag:710-749)
    #   'field' -- its expectation baked per (voxel, dir bucket): one row
    #              gather per event, zero variance, small discretization
    #              bias (ops/lightfield.py build_scatter_field)
    in_scatter_mode: str = "mc"
    # scatter-field BAKE quadrature (ops/lightfield.py build_scatter_field):
    # cell grid for the exact-cell-power env integration (None -> reuse
    # vol.field_dir_buckets) and transmittance steps per quadrature dir
    # (None -> transmittance_steps). The bake's env integral is exact per
    # cell, so these only control the angular/march resolution of the
    # SMOOTH factors T and HG.
    scatter_quad_dirs: "Tuple[int, int] | None" = None
    scatter_bake_steps: "int | None" = None


def rr_mean_events(rr_decay: float, max_bounces: int) -> float:
    """Expected scatter events per ray under the reference's RR schedule.

    The walk continues past bounce k with probability rr_decay**k
    (termProb *= 0.5 each bounce, nrc-forward.frag:781-791), so the expected
    event count is sum_k prod_{j<k} rr_decay**j -- an upper bound, since rays
    that exit the volume terminate earlier still.
    """
    total, surv = 0.0, 1.0
    for k in range(max_bounces):
        total += surv  # survival to event k+1 = prod_{j<=k} rr_decay**j
        surv *= rr_decay ** (k + 1) if rr_decay > 0 else 0.0
        if surv < 1e-6:
            break
    return total


@dataclass(frozen=True)
class PathTraceConfig:
    """Path-trace loop bounds (shader #defines).

    Render pass: 32 vertices (nrc-forward.frag:757), transmittance 32 steps.
    Train target: 64 vertices, 8 samples (nrc-train.comp:1122,1217).
    """

    max_bounces: int = 32
    transmittance_steps: int = 32
    # next-distance heuristic: U(0, 0.1 * dist_to_exit)
    # (nrc-forward.frag:816, nrc-train.comp:1165)
    step_fraction: float = 0.1
    rr_decay: float = 0.5  # Russian-roulette survival decay per bounce
    # distance sampler for the scatter walk:
    #   'reference' -- the reference's sequential march: up to max_bounces
    #                  density fetches per ray with U(0, 0.1*d_exit) steps
    #                  (nrc-forward.frag:758-822; fidelity baseline)
    #   'collision' -- analytic inverse-CDF free-flight sampling from a
    #                  baked cumulative-tau field (ops/collision.py): ONE
    #                  row gather per scatter event, analytic scatter
    #                  probability 1-exp(-tau) as the branch weight. The
    #                  delta-tracking-class estimator the north star asks
    #                  for, TPU-shaped (no rejection loop); carries
    #                  nearest-voxel/~11-deg direction-bucket
    #                  discretization bias (quantified vs 'delta' on the
    #                  cloud scene: +5.2% mean radiance, 9.4% noise-sub
    #                  image RMSE -- scripts/profile_delta_bias.py,
    #                  docs/PERFORMANCE.md r3).
    #   'delta'     -- TRUE delta tracking (Woodcock null-collision
    #                  against the global density majorant, exact AABB
    #                  exit): unbiased free-flight sampling, binary
    #                  scatter/escape branch. delta_null_steps majorant
    #                  iterations (= density gathers) per scatter event,
    #                  so it is the parity/ground-truth sampler, not the
    #                  perf default.
    sampler: str = "reference"
    # null-collision candidates per scatter event for sampler='delta'.
    # The candidates are batched (cumsum of iid exponentials -> ONE
    # density gather of delta_null_steps * n rows; render/pathtrace.py),
    # so this is a rows knob, not a sequential-steps knob -- and the
    # dominant cost knob of delta runs (the train-side target walk gathers
    # target_bounces * delta_null_steps * n rows per batch). A walk that
    # exhausts the budget while still inside the box counts as an escape:
    # P(exhaust) ~ (1 - sigma_mean/sigma_maj)^delta_null_steps. Defaults:
    # 24 candidates under the LOCAL majorant -- validated on the real
    # cloud (train-target means of local-16/24 match global-64 within
    # 1 MC se; tests + the A/B in this file's ledger pointer). Use 64
    # with delta_majorant='global'.
    delta_null_steps: int = 24
    # majorant for sampler='delta': 'global' = density_factor * max(grid);
    # 'local' = per-event segment bound from a dilated coarse max grid
    # (ops/volume.py majorant_grid) sampled at delta_majorant_samples
    # midpoints (one extra batched nearest-cell gather per event). A
    # tighter majorant stretches the candidate exponentials, so fewer
    # delta_null_steps cover the same exhaust probability.
    delta_majorant: str = "local"
    delta_majorant_cells: Tuple[int, int, int] = (8, 6, 10)
    # midpoint samples per event segment; must cover the box diagonal at
    # one coarse-cell-edge spacing (validated at trace time)
    delta_majorant_samples: int = 16
    # quadrature steps per (voxel, dir) bucket when baking the collision
    # field's cumulative-tau profile
    collision_field_steps: int = 48
    # segment transmittance to dir/point lights in the NEE shade (and
    # between vertices in the reference walk): 'field' = two tau-field row
    # gathers per segment (ops/lightfield.py segment_transmittance_field,
    # fast TPU path); 'quadrature' = the reference's 32-step quadrature;
    # 'ratio' = UNBIASED ratio tracking (NEE shade only -- the reference
    # walk keeps its faithful quadrature): prod (1 - sigma/sigma_maj) over
    # batched Woodcock candidates, one gather (ops/volume.py
    # transmittance_ratio). Paired with sampler='delta' this makes the
    # whole pipeline unbiased -- the ground-truth configuration.
    transmittance_mode: str = "field"
    # candidate budget for 'ratio' transmittance; must cover
    # sigma_maj * longest segment with margin (exhausted candidates leave
    # their factors at 1). 96 covers the production cloud's box diagonal
    # (0.4 * 107.5 = 43 expected candidates) at > +7 sigma.
    ratio_tracking_steps: int = 96
    # exact FIRST-step tau for the collision sampler: the walk's slot-0
    # tau (-> T0 see-through and the first-event branch weight p_sc)
    # comes from an `entry_tau_steps`-point quadrature at the ray's exact
    # entry point instead of the voxel-center-anchored bilinear collision
    # row. Primary rays enter ON the box face -- maximally far from the
    # row's anchor -- and the measured first-event p_sc error there is
    # +6.5% (+3.5% anchor, +3% direction bilinear;
    # scripts/profile_coll_bias.py), the dominant leg of the sampler's
    # ground-truth image bias. ONE batched (n_live x steps) density
    # gather per frame (~2-3 ms at packed 1080p); interior events keep
    # the row tau (-1.0% measured). 0 restores the row tau at slot 0.
    entry_tau_steps: int = 64
    # cross-ray scatter-event compaction for the shading phase (NN mode):
    # shade only the valid events, packed to the front by a sort, capped at
    # `compact_events` events per ray on average. NOTE: overflow drops are
    # NOT CLT noise -- valid events beyond the cap get t_r=1/light=0
    # deterministically, and the stable argsort clusters the drops on the
    # highest-index rays (bottom of the image/band) -- so the cap must sit
    # well above the RR-implied mean (validated in __post_init__). 0
    # disables (shade all N*K slots).
    compact_events: float = 2.6

    # two-phase march (NN render only): after `march_phase1_steps` full-width
    # steps, rays with zero optical depth ahead (one tau-field row gather)
    # are retired and the survivors -- measured <=10% at reference scenes by
    # step 6 -- are compacted to `march_live_fraction * n_rays` lanes for the
    # remaining steps. Requires transmittance_mode='field'. 0 disables.
    march_phase1_steps: int = 6
    march_live_fraction: float = 0.125
    # pre-march kill: rays whose ENTRY point already has zero optical depth
    # ahead (one tau gather) can never scatter -- they render as env
    # see-through without marching at all. Survivors are compacted to
    # `march_entry_fraction * n_rays` lanes before phase 1 (measured ~25%
    # entry-live at reference cameras). MEASURED A/B @1080p: 1570 ms vs
    # 1396 ms WITHOUT it -- the tau probe + state compaction overhead
    # exceeds the 6 saved full-width steps, so the default is OFF (0);
    # kept selectable for scenes with deeper marches.
    march_entry_fraction: float = 0.0

    # NN-mode collision walk slot count. RR reaches slot k with probability
    # rr_decay^(k(k-1)/2): slot 5 is ~1e-3, slot 6 ~3e-5 -- truncating at 6
    # biases the scattered term by <0.01%, at 5 by ~0.1%. Each slot is one
    # full-width march step (~8% of the 1080p frame). MEASURED A/B
    # (scripts/profile_k_pipeline.py): K=5 is 17 ms faster with mean
    # radiance identical to 4 decimals.
    coll_max_events: int = 5
    # collision-mode march split: after `coll_phase1_steps` full-width slots
    # (RR survival into slot 3 is <= 12.5% of scatter-capable rays), live
    # rays are packed to `coll_live_fraction * n_rays` lanes (O(n) cumsum
    # compaction, ops/compact.py) for the remaining slots. MEASURED A/B
    # @1080p (scripts/profile_phases_coll.py): the per-step writeback
    # scatters cost ~225 ms against ~2.25 saved full-width steps of ~2.4 ms
    # -- NET NEGATIVE at render scale, so the default is OFF (0); kept
    # selectable for much deeper marches.
    coll_phase1_steps: int = 0
    coll_live_fraction: float = 0.25
    # no-NN collision walk (train targets, reference renders): weight-based
    # Russian roulette on the continuation -- survival min(1, w/c) with the
    # event keeping its analytic weight and survivors dividing by the
    # survival probability (unbiased). The analytic weight prod_j p_sc
    # decays geometrically, so this retires near-zero-weight lanes instead
    # of dragging them through all target_bounces slots. 0 disables.
    coll_weight_rr: float = 0.05
    # no-NN split analogue of coll_phase1_steps/coll_live_fraction (only
    # active when coll_weight_rr > 0, which is what retires lanes). The r2
    # A/B measured the split net-negative (197.6 vs 187.5 ms,
    # profile_train2.py) because phase-2 events were scattered BACK to full
    # width slot-by-slot; with prefix-packed shading they now shade at the
    # packed m1 lanes and return through ONE (m1, 3) scatter-add
    # (pathtrace.py two_phase), which flips the sign: with phase-2 cheap,
    # PHASE-1 length dominates (k1 x 80k lane-steps). Measured live decay
    # of the 8x64 target walk (slot 3: 8.1%, slot 4: 5.07+-0.05% across
    # keys, slot 8: 0.52%): slot 4 fits the 1/16 cap with 1.23x margin, so
    # p1=4 is drop-free THERE; p1=3 would drop. Sweep (profile_train_split_
    # sweep.py): p1=4 34.5 ms vs p1=8 43.6; converged cache_rel_err_binned
    # identical (0.0233 vs 0.0229 @400 steps). Overflow beyond the cap
    # drops the highest lanes deterministically (compact_select).
    #
    # r5 CORRECTION: that decay profile holds only for the TRAIN TARGET
    # walk (interior RR-cut starting vertices). CAMERA no-NN walks decay
    # slower -- measured live-at-slot-4 8.7% (square view) / 4.9% (16:9)
    # vs the 6.25% cap, so the r4-late p1=4 default silently dropped
    # phase-2 events from the no-NN RENDER (the ground-truth legs):
    # square-view GT bias regressed 0.6% -> 1.75%, mean -1.05%
    # (scripts/profile_gt_bias.py r5 rerun). The default is therefore
    # back at p1=8 (camera-walk live 1.1%/0.6% at slot 8 -- 6x margin at
    # both views), and the TRAIN-side walks opt into the aggressive
    # p1=4 via coll_target_phase1_steps (targets._train_walk_cfg).
    coll_nonn_phase1_steps: int = 8
    coll_nonn_live_fraction: float = 0.0625
    # phase-1 length for the TRAIN TARGET walk only (interior starting
    # vertices, where slot-4 live is 5.07% -- the regime the p1=4 sweep
    # actually validated; applied by targets._train_walk_cfg)
    coll_target_phase1_steps: int = 4
    # CASCADE split (r5): after `coll_nonn_phase2_steps` slots at the m1
    # packed lanes, repack the still-live lanes a SECOND time to
    # `coll_nonn_live2_fraction * n` lanes for the remaining slots (their
    # events shade at the m2 lanes and return through one scatter-add,
    # exactly like phase 2). Only active in the prefix-packed-shade no-NN
    # collision walk (the train-target regime). 0 disables. The target
    # walk's measured live decay (slot 8: 0.52% of n) sits 3x under the
    # 1/64 default cap; camera walks keep this OFF (slower decay -- see
    # the r5 correction note above).
    coll_nonn_phase2_steps: int = 0
    coll_nonn_live2_fraction: float = 0.015625
    # cascade opt-in for the TRAIN TARGET walk (targets._train_walk_cfg
    # maps it into coll_nonn_phase2_steps): second repack at global slot
    # coll_target_phase1_steps + coll_target_phase2_steps = 8
    coll_target_phase2_steps: int = 4
    # bf16 event rows for the prefix-packed shade stacks: the scan's
    # stacked (k, lanes, 7) outputs -- the measured dominant step cost
    # (scripts/profile_march_ops.py) -- are written bf16 and upcast after
    # the shade pack's gather. Same quantization precedent as the
    # collect_events bf16 rows (positions land within ~0.3 world units,
    # < 1/6 of a tau-field voxel). Default OFF; the train-target walk
    # opts in via coll_target_shade_bf16.
    coll_shade_bf16: bool = False
    coll_target_shade_bf16: bool = True
    # per-lane event budget for the PHASE-1 prefix shade alone (0 =
    # inherit coll_shade_cap). With the march split on, phase 1 has only
    # p1 slots, so the global cap (4 events/lane) degenerates there:
    # cap == p1 * lanes means compact_prefix packs NOTHING and
    # trace_scene shades every slot-row dense (320k rows at the train
    # walk's 80k lanes where only ~44k events are live -- measured the
    # dominant train-step cost, scripts/profile_train_decomp.py r5).
    # Phase 2/cascade shades keep the global cap (their packed lanes run
    # ~2 live events/lane). Camera no-NN walks (p1=8 > cap) are already
    # non-degenerate and keep the default.
    coll_shade_cap_p1: float = 0.0
    # ... the train-walk opt-in (targets._train_walk_cfg). MEASURED at
    # the real 80k-lane target batch (interior starting vertices scatter
    # almost every early slot): phase-1 slot lives [0.933, 0.705, 0.448,
    # 0.282] = 2.368 events/lane, so the budget must COVER ~2.37 -- the
    # first try of 1.0 silently dropped 58% of target energy (target mean
    # 8.41 -> 7.06, /tmp cap probe -> ledger). 2.5 gives 200k rows vs the
    # mean 189.4k: ~30 sigma of per-frame fluctuation at 80k lanes, no
    # drops observed, targets bit-exact vs the dense cap -- while cutting
    # the phase-1 trace_scene from 320k dense rows to 200k (-37%).
    coll_target_shade_cap_p1: float = 2.5
    # the DELTA no-NN walk's own split (binary escape retires lanes
    # naturally -- no weight-RR needed): measured on the real cloud, the
    # 64-slot target walk averages 3.2 events/ray with 1.4% of lanes
    # alive at slot 8 and ~0 by slot 12, yet each full-width slot gathers
    # delta_null_steps * n density rows. Packing the survivors to
    # delta_live_fraction * n lanes after delta_phase1_steps cuts the
    # dominant gather rows ~4x; the 1/8 cap is ~9x above the measured
    # survivor fraction (overflow would truncate tails like the collision
    # split -- same semantics, same validation). 0 disables.
    delta_phase1_steps: int = 8
    delta_live_fraction: float = 0.125
    # collision-mode event-shade budget (events per ray): prefix-pack the
    # valid events (ops/compact.py compact_prefix) and shade once, instead
    # of dense K-slot shading. MEASURED at reference train settings: cap 4
    # takes the train step 187.5 -> 139.4 ms with identical mse. Overflow
    # (only possible when weight-RR is off or the scene is near-opaque
    # everywhere) drops the HIGHEST ray indices wholesale -- set 0 (dense)
    # for such scenes. 0 = dense shade every slot.
    coll_shade_cap: float = 4.0
    # defer ALL event shading (dir/point/env light) out of the row bands
    # into one frame-global compacted pass (banded renderers, collision
    # sampler, deterministic 'field' light modes only). Per-band event
    # fractions vary 0..~2.5/ray against a ~0.3 frame mean -- exactly the
    # query-skew problem -- so the global pass shades the compacted events
    # once instead of K dense slots per band.
    defer_shade: bool = True

    def __post_init__(self):
        if self.sampler not in ("reference", "collision", "delta"):
            raise ValueError(f"unknown sampler {self.sampler!r}")
        if self.delta_majorant not in ("global", "local"):
            raise ValueError(
                f"unknown delta_majorant {self.delta_majorant!r}")
        if self.compact_events > 0:
            mean = rr_mean_events(self.rr_decay, self.max_bounces)
            needed = mean * 1.25 + 0.5
            if self.compact_events < needed:
                raise ValueError(
                    f"compact_events={self.compact_events} is below the "
                    f"safety margin {needed:.2f} for rr_decay="
                    f"{self.rr_decay} (RR-implied mean {mean:.2f} scatter "
                    f"events/ray); overflow drops are deterministic and "
                    f"spatially clustered, not noise -- raise "
                    f"compact_events or set it to 0 to disable compaction")


@dataclass(frozen=True)
class TrainConfig:
    """Online NRC training (the nrc-train.comp dispatch)."""

    train_width: int = 100
    train_height: int = 100
    target_samples: int = 8  # nrc-train.comp:1217
    target_bounces: int = 64  # TRUE_TRACE_SAMPLE_COUNT nrc-train.comp:1122
    target_clamp: float = 1024.0  # nrc-train.comp:987
    # env light contribution in train targets. The reference's train-side
    # TraceScene omits env sampling (nrc-train.comp:1116-1120 -- commented
    # out), which with the default zero-strength dir/point lights makes all
    # targets black. 0 reproduces that; >0 makes the cache learn env light.
    env_samples: int = 8
    # training loss: 'mse' (the reference's plain squared error,
    # nrc-train.comp:1010) or 'relative_l2' ((pred-target)^2 /
    # (sg(pred)^2 + eps), the standard HDR radiance-cache loss -- plain
    # MSE underfits dim regions by their radiance ratio).
    loss: str = "mse"
    # jitter the train-grid pixel rays each step (continuous vertex
    # coverage; measured part of the 0.65 -> 0.25 r2 cache-error drop).
    # False reproduces the reference's FIXED 100x100 grid
    # (nrc-train.comp:1217) for faithful-repro runs (ADVICE r2); the
    # reference_exact() preset sets it.
    jitter_train_grid: bool = True
    # collision-mode vertex selection: trace `vertex_oversample` x n_rays
    # jittered camera rays and COMPACT the real RR-cut vertices into the
    # batch (O(n) pack). Only ~15% of camera rays produce a cut, so
    # without oversampling ~85% of the gradient lands on fallback
    # entry-point vertices the render never queries (measured: the cache
    # erred 3-6x worse at query points than at its own train points).
    # 1 disables (reference-faithful fallback behavior).
    vertex_oversample: int = 8
    # trip count of the RR vertex-selection walk (TracePathAndLearn,
    # nrc-train.comp:1190-1209). The reference iterates target_bounces (64)
    # times, but survival past step k has probability rr_decay^(k(k-1)/2)
    # (termProb decays every bounce): past step 16 that is < 2^-120, so 16
    # steps are distributionally indistinguishable from 64 at a quarter of
    # the walk cost.
    vertex_walk_steps: int = 16
    # cross-ray event compaction for target generation: shading capped at
    # `compact_events * n_rays` events packed to the front in STEP-major
    # order (overflow drops are the deepest, dimmest scatter events across
    # all rays). MEASURED @reference settings: the target walks scatter on
    # ~32 of 64 steps, and at that density the argsort + scatter-backs cost
    # MORE than dense-shading the invalid slots (502 ms vs 299 ms) -- so
    # the default is 0 (dense). Compaction stays selectable for sparser
    # scenes. (The RENDER-side compaction is separate and wins there: ~2.2
    # valid of 8 slots.)
    compact_events: float = 0.0

    @property
    def n_rays(self) -> int:
        return self.train_width * self.train_height


@dataclass(frozen=True)
class RenderConfig:
    width: int = 800
    height: int = 800
    spp: int = 1
    use_nn: bool = True
    show_non_nn: bool = False  # suppress cache term at RR cut (debug view)
    # cache-query compaction: evaluate the (128-gather) hash encode + MLP
    # only for the first `query_cap_fraction * n_rays` querying rays (sorted
    # to the front). 1.0 = evaluate for every ray (safe default). Callers
    # that know the query fraction (bench auto-tunes from a warmup frame)
    # can lower it; queries beyond the cap lose their cache term.
    query_cap_fraction: float = 1.0
    # frame-global live-ray packing for the banded collision render: one
    # tau-field gather over the full frame finds rays with ANY optical
    # depth at entry (~23% at reference cameras); the march runs only on
    # the packed live rays (O(n) cumsum pack, single writeback at the
    # end). Non-live rays are exact analytically: T0=1, pure env. The cap
    # is a fraction of the frame; live rays beyond it render as env
    # see-through (deterministic, highest pixel indices first). The live
    # mask is DETERMINISTIC per camera pose (tau-field gather, no RNG), so
    # a full-frame probe at the same pose (bench.py) makes any cap >= the
    # probed fraction exactly drop-free; pad the margin only for camera
    # motion between probes. 0 disables. (The r1 per-band
    # entry-kill measured NEGATIVE because of argsorts and per-step
    # writebacks; this frame-global form shares one pack across the whole
    # frame and writes back once.)
    live_pack_fraction: float = 0.0
    # live-mask entry-tau threshold: a ray is "live" (marched) when its
    # baked entry optical depth exceeds this. The baked dir-bucketed tau
    # field never UNDERestimates (leak audit, docs/PERFORMANCE.md), so a
    # dropped ray's true tau <= threshold and the per-ray error of the
    # pure-env composite it gets instead is <= 1 - exp(-threshold) of its
    # radiance. The default keeps the r3 conservative "any optical depth"
    # semantics; raising it is a measured row-count lever (every dropped
    # lane saves march + query + shade rows) gated by the bias probe
    # (scripts/profile_live_tau.py: exact per-threshold bias from
    # rendering ONLY the newly-dropped lanes) and the bench GT legs.
    live_tau_threshold: float = 1e-4
    # deferred-shade event budget: shade at most `shade_cap_fraction * n`
    # scatter events frame-wide (PathTraceConfig.defer_shade). The RR walk
    # yields <= ~1.66 events per scatter-capable ray, so 2.0 is drop-free
    # even for an all-cloud frame (still 3x fewer rows than the K=6 dense
    # slots); frame-mean fractions at reference cameras are ~0.3, so
    # callers that probe (bench.py) can tighten it. Overflow drops are
    # deterministic (highest event slots first).
    shade_cap_fraction: float = 2.0
    # shade slot 0 DENSE at the lane width and prefix-pack only slots
    # 1..K-1 (shade_and_query). At the packed pipeline's operating point
    # slot 0 is ~83% live (live decay [0.646, 0.291, 0.0685, ...] of the
    # r4 pack, denser still under the r5 tau-0.02 pack), so packing it
    # buys almost nothing while paying the pack's event-row gather and
    # segmented sum at full event width; dense slot-0 rows are a
    # CONTIGUOUS slice (no gather) and sum straight into rgb (no
    # segsum). With this on, shade_cap_fraction budgets only the packed
    # TAIL slots (bench probes the tail mean). Same estimator, fp-sum
    # order differs. Default off (the unpacked/banded paths keep one
    # code shape); the bench A/Bs it.
    shade_slot0_dense: bool = False
    # lax.map chunk size for the compacted cache query (shade_and_query /
    # render_image). The query phase is GATHER-OP-COUNT bound (each chunk
    # pays ~16 oct-level gathers regardless of rows; docs/PERFORMANCE.md),
    # so bigger chunks = fewer gather ops -- bounded above by the axon
    # remote compile helper's program-size limit (full-frame 388k-row
    # encodes crash it; 32k is safe everywhere, larger values are probed
    # on the real TPU by bench.py).
    query_chunk: int = 32768
    # hoist the query MLP out of the lax.map chunks: only the ENCODE's
    # gathers need chunking for the compile helper; the MLP is a plain
    # matmul, and at 32k rows it uses ~1% of the MXU. With the split
    # (nrc.make_baked_query_fn carrying encode_fn/mlp_fn), chunks emit
    # (chunk, 64) feature rows and ONE frame-wide matmul finishes them --
    # numerically identical (matmuls are row-independent).
    query_split_mlp: bool = True


@dataclass(frozen=True)
class NRCConfig:
    """Everything needed to build and run the online NRC workload."""

    mlp: MLPConfig = field(default_factory=MLPConfig)
    mlp_opt: OptimizerConfig = field(default_factory=OptimizerConfig)
    mrhe: MRHEConfig = field(default_factory=MRHEConfig)
    oneblob: OneBlobConfig = field(default_factory=OneBlobConfig)
    volume: VolumeConfig = field(default_factory=VolumeConfig)
    camera: CameraConfig = field(default_factory=CameraConfig)
    dir_light: DirLightConfig = field(default_factory=DirLightConfig)
    point_light: PointLightConfig = field(default_factory=PointLightConfig)
    env_map: EnvMapConfig = field(default_factory=EnvMapConfig)
    path: PathTraceConfig = field(default_factory=PathTraceConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    render: RenderConfig = field(default_factory=RenderConfig)
    quirks: QuirkFlags = field(default_factory=QuirkFlags)
    seed: int = 0

    def replace(self, **kw) -> "NRCConfig":
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# BASELINE.json preset configs
# ---------------------------------------------------------------------------

def mnist_config() -> "NRCConfig":
    """Config 1: MNIST tiny-MLP supervised fit (CPU-runnable sanity loop)."""
    return NRCConfig(
        mlp=MLPConfig(in_features=784, hidden=64, out_features=10,
                      n_layers=3, output_relu=False, weight_init_std=0.15),
        mlp_opt=OptimizerConfig(learning_rate=0.2, beta1=0.5),
    )


def image_fit_config() -> "NRCConfig":
    """Config 2: 2D image fit -- MRHE(2D) + tiny MLP regression."""
    return NRCConfig(
        mrhe=MRHEConfig(n_dims=2),
        mlp_opt=OptimizerConfig(learning_rate=0.003),
    )


def pathtrace_config(width: int = 800, height: int = 800,
                     spp: int = 1) -> "NRCConfig":
    """Config 3: cloud volume path trace with the cache off."""
    return NRCConfig(render=RenderConfig(width=width, height=height, spp=spp,
                                         use_nn=False),
                     env_map=EnvMapConfig(in_scatter_mode="field",
                                          scatter_quad_dirs=(16, 32),
                                          scatter_bake_steps=128),
                     volume=VolumeConfig(field_out_buckets=(16, 32)))


def nrc_online_config(width: int = 800, height: int = 800) -> "NRCConfig":
    """Config 4: NRC online train+query in the render loop (the reference's
    default workload, src/main.cpp:109-166).

    Optimizers default to guarded Adam on both the MLP and the hash table:
    measured converged cache error 0.038 vs 0.235 for the reference's
    momentum-SGD/plain-SGD pair at identical lrs and step count
    (scripts/profile_adam.py; docs/PERFORMANCE.md r3). reference_exact()
    keeps the reference's optimizers."""
    return NRCConfig(render=RenderConfig(width=width, height=height,
                                         use_nn=True),
                     env_map=EnvMapConfig(in_scatter_mode="field",
                                          scatter_quad_dirs=(16, 32),
                                          scatter_bake_steps=128),
                     volume=VolumeConfig(field_out_buckets=(16, 32)),
                     mlp_opt=OptimizerConfig(kind="adam", beta1=0.9),
                     mrhe=MRHEConfig(optimizer="adam"))


def reference_exact(width: int = 800, height: int = 800) -> "NRCConfig":
    """Bit-faithful reproduction of the reference's numerical behavior, for
    parity/regression comparisons (ADVICE r1): every QuirkFlags bug enabled,
    exact quadrature transmittance everywhere, train targets without env
    light (the reference's TraceScene comments env sampling out,
    nrc-train.comp:1116-1120), dead-code CDF branch, and no compaction caps.

    Statistical (not bitwise) fidelity only where RNG is involved: the
    reference's fract-sin RNG is replaced by threefry (SURVEY.md §7).
    """
    return NRCConfig(
        camera=CameraConfig(aspect=width / height),
        render=RenderConfig(width=width, height=height, use_nn=True,
                            query_cap_fraction=1.0),
        path=PathTraceConfig(transmittance_mode="quadrature",
                             compact_events=0.0),
        env_map=EnvMapConfig(transmittance_mode="quadrature",
                             cdf_fraction=0.0),
        train=TrainConfig(env_samples=0, jitter_train_grid=False,
                          vertex_oversample=1),
        quirks=QuirkFlags(world_space_lerp=True,
                          duplicated_feature_grad=True,
                          raw_oneblob=True,
                          quantize_density_8bit=True,
                          raw_envmap_dir=True,
                          query_dir_phase=True),
    )


def progressive_1080p_config() -> "NRCConfig":
    """Config 5: interactive 1080p progressive render with fly-through.

    (A 'premultiplied' T*Env env mode exists but measured ~2% SLOWER than
    the tau-field + exact-env pair at equal sample counts -- 48-byte rows
    gather no faster than two small rows -- so the default stays 'field';
    see docs/PERFORMANCE.md.)
    """
    return NRCConfig(
        camera=CameraConfig(aspect=1920.0 / 1080.0),
        render=RenderConfig(width=1920, height=1080, use_nn=True),
        # exact-cell-power quadrature at (16,32) dirs (resolution beyond
        # that measured irrelevant once the env integral is exact per
        # cell) x 128 transmittance steps: scatter-field mean bias vs the
        # fine-cell oracle -5.5% -> -0.50% at event-weighted points,
        # bake 7.3 -> 12.9 s (scripts/profile_sfield_knobs.py)
        env_map=EnvMapConfig(in_scatter_mode="field",
                             scatter_quad_dirs=(16, 32),
                             scatter_bake_steps=128),
        # analytic collision sampling: one row gather per scatter event
        # instead of the 32-step sequential density march (measured ~2.5x
        # whole-frame speedup at 1080p, docs/PERFORMANCE.md r2)
        path=PathTraceConfig(sampler="collision"),
        # bf16 field rows halve the bytes of the HBM-latency-bound march/
        # shade gathers: 649 -> 555 ms/frame measured, mean radiance
        # unchanged to 4 decimals (scripts/profile_bf16.py).
        # (32, 64) direction buckets: HALVES the baked-field bias vs the
        # unbiased delta sampler (9.4% -> 5.3% rel RMSE) AND cuts live
        # lanes 17% drop-free (entry-tau mask audit: strictly conservative
        # at both resolutions) -- measured 14.05 vs 13.45 Mrays/s @1080p.
        # Cost: 4x field bake time/memory (~1 GB bf16), query row cost
        # UNCHANGED (row size is bucket-count-independent).
        # (16, 32) OUT-dir buckets: -5.2% -> +0.5% mean scatter-field
        # error at real render events (scripts/profile_sfield_events.py;
        # finer buckets don't help -- spatial-nearest noise remains).
        # 378 MB bf16; query row cost unchanged.
        volume=VolumeConfig(field_dtype="bfloat16",
                            field_dir_buckets=(32, 64),
                            field_out_buckets=(16, 32)),
        # guarded Adam on MLP + hash table: converged cache error 0.038 vs
        # 0.235 for the reference's SGD pair (scripts/profile_adam.py).
        # r5 retune (profile_cache_sweep2.py, bench-anchored protocol):
        # mlp lr 2e-3 + mrhe lr halved to 5e-3, beta2 0.995 both, smooth
        # lr halving every 600 steps -- cache_rel_err_binned
        # 0.0231/0.0509 (anchor, 400/1000 steps) -> 0.0188/0.0074; best
        # of 5 variants at BOTH checkpoints, and the decay leg is what
        # takes the 1000-step tail 0.018 -> 0.007.
        mlp_opt=OptimizerConfig(kind="adam", beta1=0.9,
                                learning_rate=0.002, beta2=0.995,
                                lr_decay_steps=600, lr_decay_factor=0.5),
        mrhe=MRHEConfig(optimizer="adam", learning_rate=0.005, beta2=0.995,
                        lr_decay_steps=600, lr_decay_factor=0.5),
    )
