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

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from neuralradiancecaching_tpu.config import NRCConfig
from neuralradiancecaching_tpu.ops import phase as phase_ops
from neuralradiancecaching_tpu.ops import volume as volume_ops
from neuralradiancecaching_tpu.render import pathtrace
from neuralradiancecaching_tpu.scene.camera import Camera, pixel_rays
from neuralradiancecaching_tpu.scene.scene import Scene


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

    u_walk = jax.random.uniform(key, (cfg.train.target_bounces, 4, n),
                                dtype=dtype)
    final, _ = jax.lax.scan(step, init, u_walk)

    # never-scattered fallback (train :1211-1215)
    fallback_dir = -entry / jnp.maximum(
        jnp.linalg.norm(entry, axis=-1, keepdims=True), 1e-8)
    pos = jnp.where(final.did_scatter[:, None], final.pos, entry)
    d = jnp.where(final.did_scatter[:, None], final.dir, fallback_dir)
    return pos, d


def generate_train_batch(scene: Scene, cfg: NRCConfig,
                         key: jax.Array) -> TrainBatch:
    """Full train-batch generation for one frame: train-grid rays -> RR
    vertices -> averaged path-traced targets (clamped to target_clamp,
    nrc-train.comp:987)."""
    k_v, k_t = jax.random.split(key)
    ro, rd = pixel_rays(scene.camera, cfg.train.train_width,
                        cfg.train.train_height)
    pos, d = choose_train_vertices(scene, cfg, ro, rd, k_v)

    def one_estimate(k):
        res = pathtrace.trace_path(
            scene, cfg, pos, d, k, use_nn=False,
            env_samples=cfg.train.env_samples,
            max_bounces=cfg.train.target_bounces)
        return res.scattered

    keys = jax.random.split(k_t, cfg.train.target_samples)
    # sequential over estimates (memory: each estimate is a full path-trace
    # batch; vmap would multiply every transient by target_samples)
    estimates = jax.lax.map(one_estimate, keys)  # (S, N, 3)
    target = jnp.mean(estimates, axis=0)
    target = jnp.minimum(target, cfg.train.target_clamp)
    return TrainBatch(pos=pos, dir=d, target=target)
