"""Standalone offline path tracer with query-point export -- the reference's
``path-tracer.frag`` (+ fullscreen vert), the 'cache off' baseline and the
offline-NRC-training data generator.

Distinct from the NRC renderer (pathtrace.py): sigma_s/sigma_e
parameterization with the scattering-integral form
``s_int = sigma_s * L_sun * (1 - t_r) / sigma_e`` (path-tracer.frag:305-319),
sun self-shadowing via exponentially-spaced secondary samples (:161-195),
Russian-roulette selection of ONE internal path vertex per pixel whose
(pos, dir) is exported through MRT outputs -- resetting the accumulated
light so the pixel's color is the radiance AT that vertex (:281-297), a
transmittance < 0.01 early exit (:324-328), survival decay 0.8 (:299), full
dist-to-exit step sampling (:338-341), exp(brightness) exposure (:349-352),
and black (not env map) on miss (:370-374).

Implemented as one masked lax.scan per ray batch; MRT becomes a NamedTuple
of three images.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from neuralradiancecaching_tpu.config import VolumeConfig
from neuralradiancecaching_tpu.ops import phase as phase_ops
from neuralradiancecaching_tpu.ops import volume as volume_ops


@dataclass(frozen=True)
class OfflinePTConfig:
    """volumeData_t of path-tracer.frag:17-27 + loop constants."""

    sigma_s: float = 1.0
    sigma_e: float = 1.0
    brightness: float = 0.0
    max_bounces: int = 32            # TRUE_TRACE_SAMPLE_COUNT (:263)
    transmittance_steps: int = 16    # GetTransmittance count (:317)
    shadow_samples: int = 12         # SECONDARY_SAMPLE_COUNT (:50)
    rr_decay: float = 0.8            # totalTermProb *= 0.8 (:299)
    min_transmittance: float = 0.01  # early exit (:325)


class OfflinePTResult(NamedTuple):
    color: jnp.ndarray       # (N, 3) outColor
    export_pos: jnp.ndarray  # (N, 3) outPos: vertex pos / skySize.y (:292)
    export_dir: jnp.ndarray  # (N, 2) outDir: (theta, phi) (:289-293)


def _export_angles(d: jnp.ndarray) -> jnp.ndarray:
    """theta = atan2(y, x); phi = atan2(|xy|, z) (path-tracer.frag:289-290)."""
    theta = jnp.arctan2(d[..., 1], d[..., 0])
    phi = jnp.arctan2(jnp.sqrt(d[..., 0] ** 2 + d[..., 1] ** 2), d[..., 2])
    return jnp.stack([theta, phi], axis=-1)


def self_shadowing(field: jnp.ndarray, pos: jnp.ndarray,
                   sun_dir: jnp.ndarray, vol: VolumeConfig,
                   cfg: OfflinePTConfig) -> jnp.ndarray:
    """get_self_shadowing (:161-195): transmittance toward the sun over
    exponentially-spaced sample points pos + (exit-pos)*exp(i - S)."""
    to_sun = -sun_dir / jnp.linalg.norm(sun_dir)
    _, exit_p, _ = volume_ops.entry_exit_points(
        pos, jnp.broadcast_to(to_sun, pos.shape), vol.box_size,
        vol.box_center)
    seg = exit_p - pos
    s = cfg.shadow_samples
    fracs = jnp.exp(jnp.arange(s, dtype=pos.dtype) - s)  # (S,)
    pts = pos[..., None, :] + fracs[:, None] * seg[..., None, :]  # (...,S,3)
    dens = volume_ops.density_at(field, pts, vol)  # (..., S)
    # step sizes: distance to the next sample; last step = 1.0 (:181-184)
    deltas = (fracs[1:] - fracs[:-1])[None, :] \
        * jnp.linalg.norm(seg, axis=-1)[..., None]
    steps = jnp.concatenate(
        [deltas, jnp.ones((*pos.shape[:-1], 1), pos.dtype)], axis=-1)
    tau = jnp.sum(jnp.where(dens > 0.0, cfg.sigma_e * dens * steps, 0.0),
                  axis=-1)
    return jnp.exp(-tau)


def _sigma_transmittance(field, start, end, steps, vol, sigma_e):
    """GetTransmittance with the sigma_e scaling (:237-261)."""
    seg = end - start
    length = jnp.linalg.norm(seg, axis=-1)
    step_size = length / steps
    fracs = jnp.arange(steps, dtype=start.dtype) / steps
    pts = start[..., None, :] + fracs[:, None] * seg[..., None, :]
    dens = volume_ops.density_at(field, pts, vol)
    t = jnp.exp(-sigma_e * step_size * jnp.sum(dens, axis=-1))
    return jnp.where(length > 0.0, t, 1.0)


def trace(field: jnp.ndarray, vol: VolumeConfig, cfg: OfflinePTConfig,
          sun_dir, sun_strength: float, ro: jnp.ndarray, rd: jnp.ndarray,
          key: jax.Array) -> OfflinePTResult:
    """TrueTracePath (:264-346) over a ray batch, masked scan."""
    n = ro.shape[0]
    dtype = ro.dtype
    sun_dir = jnp.asarray(sun_dir, dtype=dtype)
    sky_y = vol.box_size[1]  # outPos normalization skySize.y (:292)

    entry, _, hit = volume_ops.entry_exit_points(ro, rd, vol.box_size,
                                                 vol.box_center)

    class S(NamedTuple):
        cur_pos: jnp.ndarray
        last_pos: jnp.ndarray
        cur_dir: jnp.ndarray
        last_dir: jnp.ndarray
        scattered: jnp.ndarray
        trans: jnp.ndarray
        term_prob: jnp.ndarray
        selected: jnp.ndarray  # hasSelectedInternalPath
        done: jnp.ndarray
        exp_pos: jnp.ndarray
        exp_dir: jnp.ndarray

    # default export: primary ray (main, :358-364)
    init = S(cur_pos=entry, last_pos=entry, cur_dir=rd,
             last_dir=jnp.zeros_like(rd),
             scattered=jnp.zeros((n, 3), dtype=dtype),
             trans=jnp.ones((n,), dtype=dtype),
             term_prob=jnp.ones((n,), dtype=dtype),
             selected=jnp.zeros((n,), dtype=bool),
             done=jnp.zeros((n,), dtype=bool),
             exp_pos=ro / sky_y, exp_dir=_export_angles(rd))

    def step(s: S, i):
        k = jax.random.fold_in(key, i)
        k_rr, k_dir, k_dist = jax.random.split(k, 3)

        # internal-path selection: reset light, export the vertex (:281-297)
        u = jax.random.uniform(k_rr, (n,), dtype=dtype)
        select = ~s.selected & (u > s.term_prob) & ~s.done
        scattered = jnp.where(select[:, None], 0.0, s.scattered)
        trans = jnp.where(select, 1.0, s.trans)
        exp_pos = jnp.where(select[:, None], s.cur_pos / sky_y, s.exp_pos)
        exp_dir = jnp.where(select[:, None], _export_angles(s.cur_dir),
                            s.exp_dir)
        selected = s.selected | select
        term_prob = jnp.where(s.done, s.term_prob, s.term_prob * cfg.rr_decay)

        density = volume_ops.density_at(field, s.cur_pos, vol)
        scatter = (density > 0.0) & ~s.done

        sun_phase = phase_ops.hg_phase(jnp.sum(sun_dir * -s.cur_dir, axis=-1),
                                       vol.hg_g)
        shadow = self_shadowing(field, s.cur_pos, sun_dir, vol, cfg)
        sun_light = shadow * sun_phase * sun_strength
        sigma_s = density * cfg.sigma_s
        sigma_e = jnp.maximum(density * cfg.sigma_e, 1e-8)
        t_r = _sigma_transmittance(field, s.cur_pos, s.last_pos,
                                   cfg.transmittance_steps, vol, cfg.sigma_e)
        s_int = (sigma_s * sun_light * (1.0 - t_r)) / sigma_e  # (:319)

        scattered = scattered + jnp.where(scatter, trans * s_int,
                                          0.0)[:, None] * jnp.ones((1, 3))
        trans = jnp.where(scatter, trans * t_r, trans)
        done = s.done | (scatter & (trans < cfg.min_transmittance))

        last_pos = jnp.where(scatter[:, None], s.cur_pos, s.last_pos)
        last_dir = jnp.where(scatter[:, None], s.cur_dir, s.last_dir)
        new_dir = phase_ops.sample_hg_direction(k_dir, s.cur_dir, vol.hg_g)
        cur_dir = jnp.where(scatter[:, None], new_dir, s.cur_dir)

        # full dist-to-exit step (:338-341) -- NOT the nrc 0.1 fraction
        _, t_exit, _ = volume_ops.ray_aabb(s.cur_pos, cur_dir, vol.box_size,
                                           vol.box_center)
        u2 = jax.random.uniform(k_dist, (n,), dtype=dtype)
        cur_pos = jnp.where(done[:, None], s.cur_pos,
                            s.cur_pos + cur_dir
                            * (u2 * jnp.maximum(t_exit, 0.0))[:, None])

        return S(cur_pos, last_pos, cur_dir, last_dir, scattered, trans,
                 term_prob, selected, done, exp_pos, exp_dir), None

    s, _ = jax.lax.scan(step, init, jnp.arange(cfg.max_bounces))

    color = s.scattered * math.exp(cfg.brightness)  # (:349-352)
    color = jnp.where(hit[:, None], color, 0.0)     # black on miss (:370)
    return OfflinePTResult(color=color, export_pos=s.exp_pos,
                           export_dir=s.exp_dir)
