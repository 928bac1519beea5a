"""Collision field: baked free-flight distance sampling for the path march.

The reference marches every ray with up to 32 sequential density fetches and
an ad-hoc U(0, 0.1*dist_to_exit) distance heuristic (nrc-forward.frag:758-822,
nrc-train.comp:1123-1171). On TPU that serial walk is the frame's dominant
cost: each scan step is one descriptor-bound gather plus full ray-state
updates, and most steps hit empty space.

This module replaces the whole walk with ANALYTIC collision sampling -- the
delta-tracking-class estimator the north star asks for (BASELINE.json), made
TPU-shaped by baking the free-flight CDF instead of rejection-looping:

    For every (voxel, direction bucket) of the tau-field discretization we
    precompute the cumulative optical depth profile along the ray to the box
    exit and store ONE row:

        [tau_c00, tau_c01, tau_c10, tau_c11,  t(0), t(1/3), t(2/3), t(1)]

    where tau_cXY are the (theta, phi) bilinear corners of the total optical
    depth (same packing as ops/lightfield.py) and t(q) is the distance at
    which the cumulative optical depth reaches q * tau_total (t(0) = first
    nonzero density, t(1) = last).

    Sampling a scatter distance is then exact inverse-CDF sampling:

        p_scatter = 1 - exp(-tau_total)            # analytic branch weight
        tau* = -log1p(-u * p_scatter)              # truncated exponential
        t    = interp(tau*/tau_total over the 4 stored quantile knots)

    ONE row gather per scatter event -- no rejection iterations, no
    per-step density fetches, no majorant traversal.

Discretization bias: nearest voxel (~2 world units) + nearest direction
bucket (11 deg) for the knots, bilinear direction interpolation for
tau_total -- the same class of error the tau field already carries for all
transmittance in 'field' mode. The reference's scheme remains available as
``PathTraceConfig.sampler='reference'`` (bit-faithful fidelity baseline).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from neuralradiancecaching_tpu.config import VolumeConfig
from neuralradiancecaching_tpu.ops import volume as volume_ops
from neuralradiancecaching_tpu.ops.lightfield import (FIELD_SHAPE,
                                                      _dir_from_theta_phi,
                                                      dir_to_theta_phi)

N_KNOTS = 4  # quantile knots at q = 0, 1/3, 2/3, 1
ROW_WIDTH = 4 + N_KNOTS


@partial(jax.jit, static_argnames=("vol", "steps", "field_shape"))
def build_collision_field(density_field: jnp.ndarray, vol: VolumeConfig,
                          steps: int = 48,
                          field_shape: Tuple[int, int, int] | None = None
                          ) -> jnp.ndarray:
    """(V * N_THETA * N_PHI, 8) rows; V = prod(field_shape).

    Row (vox, it, ip): bilinear tau corners [tau(it,ip), tau(it,ip+1),
    tau(it+1,ip), tau(it+1,ip+1)] (phi wraps, theta clamps -- identical
    packing to lightfield.build_transmittance_field) followed by the
    N_KNOTS quantile distances of THIS bucket's cumulative-tau profile.
    """
    field_shape = field_shape or vol.field_shape
    N_THETA, N_PHI = vol.field_dir_buckets
    nx, ny, nz = field_shape
    size = jnp.asarray(vol.box_size, jnp.float32)
    center = jnp.asarray(vol.box_center, jnp.float32)
    ax = [(jnp.arange(n, dtype=jnp.float32) + 0.5) / n - 0.5
          for n in field_shape]
    gx, gy, gz = jnp.meshgrid(*ax, indexing="ij")
    pts = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3) * size + center

    th = (jnp.arange(N_THETA, dtype=jnp.float32) + 0.5) / N_THETA * math.pi
    ph = ((jnp.arange(N_PHI, dtype=jnp.float32) + 0.5) / N_PHI * 2.0
          - 1.0) * math.pi
    tt, pp = jnp.meshgrid(th, ph, indexing="ij")
    dirs = _dir_from_theta_phi(tt, pp).reshape(-1, 3)  # (D, 3)

    qs = jnp.arange(N_KNOTS, dtype=jnp.float32) / (N_KNOTS - 1)  # (J,)

    def per_chunk(dc):
        # dc: (C, 3) directions; flatten (C, V) ray grid into one batch --
        # per-direction dispatches are far too small to amortize the
        # descriptor-bound gathers (measured 509 s -> ~40 s for the bake)
        c = dc.shape[0]
        v = pts.shape[0]
        dn = jnp.broadcast_to(dc[:, None, :], (c, v, 3)).reshape(-1, 3)
        p = jnp.broadcast_to(pts[None, :, :], (c, v, 3)).reshape(-1, 3)
        tau_total, knots = _profile(p, dn)
        return tau_total.reshape(c, v), knots.reshape(c, v, N_KNOTS)

    def _profile(pts, dn):
        _, t_exit, _ = volume_ops.ray_aabb(pts, dn, vol.box_size,
                                           vol.box_center)
        t_exit = jnp.maximum(t_exit, 1e-6)
        dt = t_exit / steps                                       # (V,)
        frac = (jnp.arange(steps, dtype=jnp.float32) + 0.5) / steps
        sp = pts[:, None, :] + (frac[None, :, None]
                                * t_exit[:, None, None]) * dn[:, None, :]
        sigma = volume_ops.density_at(density_field, sp, vol)     # (V, S)
        cum = jnp.cumsum(sigma, axis=1) * dt[:, None]  # tau at (j+1)*dt
        tau_total = cum[:, -1]                                    # (V,)

        # knot 0: distance of the FIRST nonzero-density sample (left edge)
        has = sigma > 0.0
        first = jnp.argmax(has, axis=1)                           # (V,)
        t0 = first.astype(jnp.float32) * dt
        t0 = jnp.where(jnp.any(has, axis=1), t0, 0.0)

        # knots q>0: invert the piecewise-linear cumulative profile
        target = qs[None, 1:] * tau_total[:, None]                # (V, J-1)
        j = jnp.sum(cum[:, None, :] < target[:, :, None],
                    axis=-1)                                      # (V, J-1)
        j = jnp.minimum(j, steps - 1)
        cum_pad = jnp.concatenate(
            [jnp.zeros_like(cum[:, :1]), cum], axis=1)            # (V, S+1)
        lo = jnp.take_along_axis(cum_pad, j, axis=1)              # cum_{j-1}
        hi = jnp.take_along_axis(cum, j, axis=1)                  # cum_j
        w = (target - lo) / jnp.maximum(hi - lo, 1e-20)
        tq = (j.astype(jnp.float32) + jnp.clip(w, 0.0, 1.0)) * dt[:, None]
        knots = jnp.concatenate([t0[:, None], tq], axis=1)        # (V, J)
        knots = jnp.where(tau_total[:, None] > 0.0, knots, 0.0)
        return tau_total, knots

    n_dirs = dirs.shape[0]
    chunk = 8 if n_dirs % 8 == 0 else 1
    tau, knots = jax.lax.map(per_chunk,
                             dirs.reshape(-1, chunk, 3))  # (D/C, C, V[, J])
    tau = tau.reshape(n_dirs, -1)
    knots = knots.reshape(n_dirs, -1, N_KNOTS)
    tau = jnp.minimum(tau, 40.0)
    tau = jnp.transpose(tau).reshape(-1, N_THETA, N_PHI)  # (V, T, P)

    # corner-pack tau exactly like the tau field (phi wraps, theta clamps)
    c00 = tau
    c01 = jnp.roll(tau, -1, axis=2)
    up = jnp.concatenate([tau[:, 1:], tau[:, -1:]], axis=1)
    c10 = up
    c11 = jnp.roll(up, -1, axis=2)
    tau4 = jnp.stack([c00, c01, c10, c11], axis=-1)  # (V, T, P, 4)

    knots = jnp.transpose(knots, (1, 0, 2)).reshape(
        -1, N_THETA, N_PHI, N_KNOTS)                  # (V, T, P, J)
    rows = jnp.concatenate([tau4, knots], axis=-1)
    return rows.reshape(-1, ROW_WIDTH)


def query_collision_rows(field: jnp.ndarray, pos: jnp.ndarray,
                         d: jnp.ndarray, vol: VolumeConfig,
                         field_shape: Tuple[int, int, int] | None = None
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One row gather -> (tau_total bilinear over (theta, phi), knots (.., J)
    of the nearest bucket). pos/d: (..., 3)."""
    field_shape = field_shape or vol.field_shape
    N_THETA, N_PHI = vol.field_dir_buckets
    nx, ny, nz = field_shape
    uvw = volume_ops.world_to_uvw(pos, vol.box_size, vol.box_center)
    ijk = jnp.clip((uvw * jnp.asarray(field_shape, uvw.dtype)).astype(
        jnp.int32), 0, jnp.asarray(field_shape, jnp.int32) - 1)
    vox = ijk[..., 0] * (ny * nz) + ijk[..., 1] * nz + ijk[..., 2]

    theta, phi = dir_to_theta_phi(d)
    ft = theta / math.pi * N_THETA - 0.5
    fp = (phi / math.pi + 1.0) * 0.5 * N_PHI - 0.5
    it0 = jnp.floor(ft)
    ip0 = jnp.floor(fp)
    wt = jnp.clip(ft - it0, 0.0, 1.0)
    wt = jnp.where(it0 < 0, 0.0, wt)
    wp = fp - ip0
    it0c = jnp.clip(it0.astype(jnp.int32), 0, N_THETA - 1)
    ip0i = jnp.mod(ip0.astype(jnp.int32), N_PHI)

    row_idx = vox * (N_THETA * N_PHI) + it0c * N_PHI + ip0i
    # fields may be stored bf16 (half the gather bytes; the march gather is
    # HBM-latency-bound at 32B rows) -- upcast after the gather
    rows = jnp.take(field, row_idx, axis=0).astype(pos.dtype)  # (..., 8)
    c00, c01, c10, c11 = (rows[..., 0], rows[..., 1], rows[..., 2],
                          rows[..., 3])
    top = c00 + (c01 - c00) * wp
    bot = c10 + (c11 - c10) * wp
    tau = top + (bot - top) * wt
    return tau, rows[..., 4:]


def sample_collision(field: jnp.ndarray, pos: jnp.ndarray, d: jnp.ndarray,
                     u: jnp.ndarray, vol: VolumeConfig,
                     field_shape: Tuple[int, int, int] | None = None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample a scatter distance along (pos, d) by exact inverse-CDF of the
    baked profile.

    u: (...,) uniforms. Returns (t, p_scatter): the sampled distance
    (conditioned on scattering) and the analytic scatter probability
    1 - exp(-tau_total). Zero-tau rays return (0, 0).
    """
    field_shape = field_shape or vol.field_shape
    tau, knots = query_collision_rows(field, pos, d, vol, field_shape)
    t = knots_to_distance(tau, knots, u)
    p_sc = -jnp.expm1(-tau)
    return t, p_sc


def knots_to_distance(tau: jnp.ndarray, knots: jnp.ndarray,
                      u: jnp.ndarray) -> jnp.ndarray:
    """Invert the quantile knots: u ~ U[0,1) -> scatter distance.

    tau* = -log1p(-u * p_scatter) is a truncated-exponential draw in
    [0, tau); q = tau*/tau indexes the knot table linearly.
    """
    p_sc = -jnp.expm1(-tau)
    tau_star = -jnp.log1p(-u * p_sc)
    q = jnp.clip(tau_star / jnp.maximum(tau, 1e-12), 0.0, 1.0)
    f = q * (N_KNOTS - 1)
    i = jnp.clip(jnp.floor(f).astype(jnp.int32), 0, N_KNOTS - 2)
    frac = f - i.astype(f.dtype)
    # N_KNOTS is 4: arithmetic segment select beats two take_along_axis
    # gathers (this runs once per march step in the render hot loop)
    k0, k1, k2, k3 = (knots[..., 0], knots[..., 1], knots[..., 2],
                      knots[..., 3])
    lo = jnp.where(i == 0, k0, jnp.where(i == 1, k1, k2))
    hi = jnp.where(i == 0, k1, jnp.where(i == 1, k2, k3))
    return lo + frac * (hi - lo)
