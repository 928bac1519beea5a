"""Precomputed exit-transmittance field for env-map lighting.

The dominant cost of the reference's env estimator (nrc-forward.frag:710-749)
is the 16-step transmittance quadrature per sampled direction -- recomputed
for every scatter vertex of every ray, every frame, although the density
grid and the environment are STATIC. This module precomputes

    T_field[voxel, theta, phi] = transmittance(voxel_center -> box exit
                                               along dir(theta, phi))

once per scene (a few tens of ms on TPU) and turns each env sample into ONE
128-float row gather (nearest voxel, the (8, 16) direction sheet bilinearly
interpolated on the VPU -- the row width is exactly one TPU lane register).

This is a TPU-native counterpart of a shadow/deep-shadow map: spatially
nearest at ~2 world-unit resolution, bias bounded by the smoothness of T.
``EnvMapConfig.transmittance_mode`` selects between this fast 'field' path
and the exact 'quadrature' path (bit-faithful to the reference); both
estimators share the same direction sampling so images agree to the field's
interpolation error.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from neuralradiancecaching_tpu.config import NRCConfig, VolumeConfig
from neuralradiancecaching_tpu.ops import volume as volume_ops

# direction discretization: equirect (theta from +y polar, phi azimuth).
# 16x32 = 512 buckets, ~11 deg bins. NOTE: these module constants are only
# the DEFAULT of VolumeConfig.field_dir_buckets -- every build/query
# function shadows them from `vol.field_dir_buckets`, so patching the
# module attributes has NO effect (change the config field instead).
N_THETA = 16
N_PHI = 32
FIELD_SHAPE: Tuple[int, int, int] = (32, 24, 40)


def _dir_from_theta_phi(theta: jnp.ndarray, phi: jnp.ndarray) -> jnp.ndarray:
    """theta in [0, pi] (polar from +y), phi in [-pi, pi)."""
    st = jnp.sin(theta)
    return jnp.stack([st * jnp.cos(phi), jnp.cos(theta), st * jnp.sin(phi)],
                     axis=-1)


def dir_to_theta_phi(d: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    theta = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(d[..., 2], d[..., 0])
    return theta, phi


from functools import partial


@partial(jax.jit, static_argnames=("vol", "steps", "field_shape"))
def build_transmittance_field(density_field: jnp.ndarray, vol: VolumeConfig,
                              steps: int = 16,
                              field_shape: Tuple[int, int, int] | None = None
                              ) -> jnp.ndarray:
    """(V * NT * NP, 4) corner-packed exit-tau rows (NT, NP =
    vol.field_dir_buckets),
    V = prod(field_shape): row (vox, it, ip) holds the bilinear patch
    [tau(it,ip), tau(it,ip+1), tau(it+1,ip), tau(it+1,ip+1)] with phi
    wraparound and theta clamping baked in.

    Voxel centers span the volume AABB; directions are the equirect bucket
    CENTERS (matching the query's bilinear reconstruction).
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

    def per_dir(d):
        dn = jnp.broadcast_to(d, pts.shape)
        _, exit_p, _ = volume_ops.entry_exit_points(pts, dn, vol.box_size,
                                                    vol.box_center)
        return volume_ops.transmittance(density_field, pts, exit_p, steps,
                                        vol)  # (V,)

    t = jax.lax.map(per_dir, dirs)  # (D, V)
    # store OPTICAL DEPTH: tau interpolates far more accurately than T
    # (line integrals are near-linear in position/direction), exp() at query
    tau = -jnp.log(jnp.maximum(t, 1e-20))
    tau = jnp.minimum(tau, 40.0)
    tau = jnp.transpose(tau).reshape(-1, N_THETA, N_PHI)  # (V, T, P)

    # corner-pack so ONE 16-byte row gather yields the full (theta, phi)
    # bilinear patch -- gathering the whole 512-float direction sheet costs
    # 128x the bytes for 4 useful values (measured: dominates the frame)
    c00 = tau
    c01 = jnp.roll(tau, -1, axis=2)            # phi wraps
    up = jnp.concatenate([tau[:, 1:], tau[:, -1:]], axis=1)  # theta clamps
    c10 = up
    c11 = jnp.roll(up, -1, axis=2)
    packed = jnp.stack([c00, c01, c10, c11], axis=-1)  # (V, T, P, 4)
    return packed.reshape(-1, 4)


def query_tau_field(field: jnp.ndarray, pos: jnp.ndarray,
                    d: jnp.ndarray, vol: VolumeConfig,
                    field_shape: Tuple[int, int, int] | None = None
                    ) -> jnp.ndarray:
    """Optical depth tau(pos -> exit along d): nearest voxel row + bilinear
    over (theta, phi) with phi wraparound. pos/d: (..., 3) -> (...,)."""
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
    # theta edge: both corners clamp to the same bucket -> force wt = 0/1
    wt = jnp.clip(ft - it0, 0.0, 1.0)
    wt = jnp.where(it0 < 0, 0.0, wt)
    wp = fp - ip0
    it0c = jnp.clip(it0.astype(jnp.int32), 0, N_THETA - 1)
    ip0i = jnp.mod(ip0.astype(jnp.int32), N_PHI)

    row_idx = (vox * (N_THETA * N_PHI) + it0c * N_PHI + ip0i)
    # fields may be stored bf16 -- upcast after the gather
    rows = jnp.take(field, row_idx, axis=0).astype(pos.dtype)  # (..., 4)
    c00, c01, c10, c11 = (rows[..., 0], rows[..., 1], rows[..., 2],
                          rows[..., 3])
    top = c00 + (c01 - c00) * wp
    bot = c10 + (c11 - c10) * wp
    return top + (bot - top) * wt


def query_transmittance_field(field: jnp.ndarray, pos: jnp.ndarray,
                              d: jnp.ndarray, vol: VolumeConfig,
                              field_shape: Tuple[int, int, int] | None = None
                              ) -> jnp.ndarray:
    """T(pos -> exit along d) = exp(-tau)."""
    field_shape = field_shape or vol.field_shape
    return jnp.exp(-query_tau_field(field, pos, d, vol, field_shape))


def segment_transmittance_field(field: jnp.ndarray, a: jnp.ndarray,
                                b: jnp.ndarray, vol: VolumeConfig,
                                field_shape: Tuple[int, int, int] | None = None
                                ) -> jnp.ndarray:
    """Transmittance of the segment a -> b from the SAME exit-tau field:

        tau(a -> b) = tau(a -> exit along d) - tau(b -> exit along d),
        d = (b - a)/|b - a|

    exact in the continuum (both points share the exit ray), so the only
    error is field interpolation -- and it partially cancels between the two
    correlated lookups. TWO row gathers replace the reference's 32-step
    quadrature (GetTransmittance, nrc-train.comp:1032-1053).
    """
    field_shape = field_shape or vol.field_shape
    seg = b - a
    length = jnp.linalg.norm(seg, axis=-1)
    d = seg / jnp.maximum(length, 1e-12)[..., None]
    tau = (query_tau_field(field, a, d, vol, field_shape)
           - query_tau_field(field, b, d, vol, field_shape))
    t = jnp.exp(-jnp.maximum(tau, 0.0))
    return jnp.where(length > 0.0, t, 1.0)


def precompute_for_scene(scene, cfg: NRCConfig):
    """Returns the scene's transmittance field (built from its corner-table
    density)."""
    return build_transmittance_field(scene.density, cfg.volume,
                                     steps=cfg.env_map.transmittance_steps)


# ---------------------------------------------------------------------------
# Premultiplied radiance field: L(vox, dir) = T(vox -> exit, dir) * Env(dir)
#
# One 12-float row gather per env sample (the 'premultiplied' env mode)
# instead of tau row + env row. Bakes the environment at the direction-
# bucket resolution, so in-scattered env light is angularly blurred to
# ~11-22 deg -- acceptable for volumetric in-scatter (already an average of
# 8 HG samples), kept OFF the reference-default config.
# ---------------------------------------------------------------------------

# NOTE: like N_THETA/N_PHI above, these are only the DEFAULT of
# VolumeConfig.field_out_buckets -- build_radiance_field /
# build_scatter_field / query_radiance_field all shadow them from
# `vol.field_out_buckets`, so patching the module attributes has NO effect.
L_N_THETA = 8
L_N_PHI = 16


@partial(jax.jit, static_argnames=("vol", "steps", "field_shape"))
def build_radiance_field(density_field: jnp.ndarray, env_image: jnp.ndarray,
                         vol: VolumeConfig, steps: int = 16,
                         field_shape: Tuple[int, int, int] | None = None
                         ) -> jnp.ndarray:
    """(V * L_N_THETA * L_N_PHI, 12) rows: the (theta, phi) bilinear patch
    of T * Env rgb (WITHOUT the hpm strength -- applied at query time)."""
    field_shape = field_shape or vol.field_shape
    L_N_THETA, L_N_PHI = vol.field_out_buckets
    nx, ny, nz = field_shape
    size = jnp.asarray(vol.box_size, jnp.float32)
    center = jnp.asarray(vol.box_center, jnp.float32)
    ax = [(jnp.arange(n, dtype=jnp.float32) + 0.5) / n - 0.5
          for n in field_shape]
    gx, gy, gz = jnp.meshgrid(*ax, indexing="ij")
    pts = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3) * size + center

    th = (jnp.arange(L_N_THETA, dtype=jnp.float32) + 0.5) / L_N_THETA * math.pi
    ph = ((jnp.arange(L_N_PHI, dtype=jnp.float32) + 0.5) / L_N_PHI * 2.0
          - 1.0) * math.pi
    tt, pp = jnp.meshgrid(th, ph, indexing="ij")
    dirs = _dir_from_theta_phi(tt, pp).reshape(-1, 3)  # (D, 3)

    from neuralradiancecaching_tpu.ops import envmap as envmap_ops
    # env radiance per bucket center (exact equirect lookup)
    uv = envmap_ops.dir_to_equirect_uv(dirs)
    env_rgb = envmap_ops._bilinear_wrap_u(env_image, uv)  # (D, 3)

    def per_dir(args):
        d, rgb = args
        dn = jnp.broadcast_to(d, pts.shape)
        _, exit_p, _ = volume_ops.entry_exit_points(pts, dn, vol.box_size,
                                                    vol.box_center)
        t = volume_ops.transmittance(density_field, pts, exit_p, steps, vol)
        return t[:, None] * rgb  # (V, 3)

    lum = jax.lax.map(per_dir, (dirs, env_rgb))  # (D, V, 3)
    lum = jnp.transpose(lum, (1, 0, 2)).reshape(-1, L_N_THETA, L_N_PHI, 3)

    c00 = lum
    c01 = jnp.roll(lum, -1, axis=2)
    up = jnp.concatenate([lum[:, 1:], lum[:, -1:]], axis=1)
    c10 = up
    c11 = jnp.roll(up, -1, axis=2)
    packed = jnp.concatenate([c00, c01, c10, c11], axis=-1)  # (V,T,P,12)
    return packed.reshape(-1, 12)


# ---------------------------------------------------------------------------
# HG-convolved in-scatter field:
#   S(vox, d) = E_{w ~ HG(.|d)}[ T(vox -> exit along w) * Env(w) ]
#             = sum_w HG(d.w) T(vox, w) Env(w) dOmega(w)
#
# This is the EXPECTATION of the renderer's 8-sample phase-sampled env
# estimator (SampleHdrEnvMap, nrc-forward.frag:710-749) baked per (voxel,
# out-direction bucket): ONE 12-float row gather replaces 8 samples x
# (tau gather + env gather) + 8 HG direction draws per scatter event.
# Variance goes to zero; the cost is discretization bias (nearest voxel at
# ~2 world units + direction bilinear at 22 deg buckets -- smooth because
# the HG(g=0.7) kernel has a ~40 deg lobe). EnvMapConfig.in_scatter_mode
# selects 'mc' (reference estimator) vs 'field' (this bake).
# ---------------------------------------------------------------------------


def env_cell_integrals(env_image: jnp.ndarray, n_theta: int, n_phi: int
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact per-cell env integrals over the (theta, phi) quadrature grid.

    Returns ``(power, cdirs)``: ``power[q, 3] = int_cell Env(w) dw`` (an
    exact sin-weighted texel sum -- the equirect rows are uniform in polar
    theta, so texels never straddle cells) and ``cdirs[q, 3]`` the
    luminance-weighted mean direction of each cell (unit; geometric cell
    center for dark cells).

    Point-sampling Env at cell centers aliases concentrated emitters --
    the bench env's horizon sun region carries ~42% of total power in
    ~0.7% of the sphere, and scripts/profile_scatter_field_bias.py
    measured a -8.4%-mean, dir-count-non-monotone residual from it.
    Integrating Env exactly per cell and evaluating the smooth factors
    (T, HG) at the cell's power centroid removes that aliasing without
    changing the quadrature cost.
    """
    H, W = env_image.shape[0], env_image.shape[1]
    vi = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H
    theta = math.pi * (1.0 - vi)                 # polar from +y; row-uniform
    phi = ((jnp.arange(W, dtype=jnp.float32) + 0.5) / W * 2.0 - 1.0) * math.pi
    dom = jnp.sin(theta) * (math.pi / H) * (2.0 * math.pi / W)      # (H,)
    tcell = jnp.clip((theta / math.pi * n_theta).astype(jnp.int32),
                     0, n_theta - 1)
    pcell = jnp.clip(((phi / math.pi + 1.0) * 0.5 * n_phi).astype(jnp.int32),
                     0, n_phi - 1)
    seg = (tcell[:, None] * n_phi + pcell[None, :]).reshape(-1)     # (H*W,)
    q = n_theta * n_phi
    w_rgb = env_image.astype(jnp.float32) * dom[:, None, None]      # (H,W,3)
    power = jax.ops.segment_sum(w_rgb.reshape(-1, 3), seg, num_segments=q)
    lum = w_rgb @ jnp.asarray([0.2126, 0.7152, 0.0722], jnp.float32)
    tt, pp = jnp.meshgrid(theta, phi, indexing="ij")
    dirs = _dir_from_theta_phi(tt, pp).reshape(-1, 3)               # (HW, 3)
    m = jax.ops.segment_sum(dirs * lum.reshape(-1, 1), seg, num_segments=q)
    cth = (jnp.arange(n_theta, dtype=jnp.float32) + 0.5) / n_theta * math.pi
    cph = ((jnp.arange(n_phi, dtype=jnp.float32) + 0.5) / n_phi * 2.0
           - 1.0) * math.pi
    ctt, cpp = jnp.meshgrid(cth, cph, indexing="ij")
    cdirs0 = _dir_from_theta_phi(ctt, cpp).reshape(-1, 3)
    norm = jnp.linalg.norm(m, axis=1, keepdims=True)
    cdirs = jnp.where(norm > 1e-12, m / jnp.maximum(norm, 1e-30), cdirs0)
    return power, cdirs


@partial(jax.jit,
         static_argnames=("vol", "hg_g", "steps", "field_shape", "quad_dirs"))
def build_scatter_field(density_field: jnp.ndarray, env_image: jnp.ndarray,
                        vol: VolumeConfig, hg_g: float, steps: int = 16,
                        field_shape: Tuple[int, int, int] | None = None,
                        quad_dirs: Tuple[int, int] | None = None
                        ) -> jnp.ndarray:
    """(V * L_N_THETA * L_N_PHI, 12) corner-packed rows of the HG-convolved
    in-scatter radiance (WITHOUT hpm strength -- applied at query time).

    The quadrature integrates the env EXACTLY per cell (env_cell_integrals)
    and samples the smooth factors T and HG once per cell at the cell's
    env-power centroid: S_o = sum_q HG(o . c_q) T(c_q) P_q. With a constant
    env this reduces to plain product quadrature; with a concentrated
    emitter it stays unbiased where center-point env sampling aliased at
    the -8%-mean level (scripts/profile_scatter_field_bias.py). No row
    normalization -- the cell powers are exact, and normalizing would
    re-bias them. ``quad_dirs`` sets the quadrature cell grid (default
    vol.field_dir_buckets; EnvMapConfig.scatter_quad_dirs overrides).
    """
    field_shape = field_shape or vol.field_shape
    L_N_THETA, L_N_PHI = vol.field_out_buckets
    from neuralradiancecaching_tpu.ops import phase as phase_ops

    size = jnp.asarray(vol.box_size, jnp.float32)
    center = jnp.asarray(vol.box_center, jnp.float32)
    ax = [(jnp.arange(n, dtype=jnp.float32) + 0.5) / n - 0.5
          for n in field_shape]
    gx, gy, gz = jnp.meshgrid(*ax, indexing="ij")
    pts = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3) * size + center

    N_THETA, N_PHI = quad_dirs or vol.field_dir_buckets
    env_power, qdirs = env_cell_integrals(env_image, N_THETA, N_PHI)

    def per_dir(d):
        dn = jnp.broadcast_to(d, pts.shape)
        _, exit_p, _ = volume_ops.entry_exit_points(pts, dn, vol.box_size,
                                                    vol.box_center)
        return volume_ops.transmittance(density_field, pts, exit_p, steps,
                                        vol)  # (V,)

    t = jax.lax.map(per_dir, qdirs)                              # (Q, V)

    # out-direction bucket centers (coarse L_N_THETA x L_N_PHI grid)
    oth = (jnp.arange(L_N_THETA, dtype=jnp.float32) + 0.5) \
        / L_N_THETA * math.pi
    oph = ((jnp.arange(L_N_PHI, dtype=jnp.float32) + 0.5) / L_N_PHI * 2.0
           - 1.0) * math.pi
    ott, opp = jnp.meshgrid(oth, oph, indexing="ij")
    odirs = _dir_from_theta_phi(ott, opp).reshape(-1, 3)         # (O, 3)

    # the reference's HG convention is mu-normalized (integrates to 2*pi
    # over solid angle, ops/phase.py hg_phase); the phase-sampled MC
    # estimator this field replaces computes E[T*Env] under HG/(2*pi)
    w = phase_ops.hg_phase(odirs @ qdirs.T, hg_g) / (2.0 * math.pi)  # (O, Q)
    # 3 MXU matmuls (O,Q)x(Q,V) instead of a (V,Q,3) materialization
    scatter = jnp.stack(
        [(w * env_power[:, c][None, :]) @ t for c in range(3)],
        axis=-1)                                                 # (O, V, 3)
    scatter = jnp.transpose(scatter, (1, 0, 2))                  # (V, O, 3)
    scatter = scatter.reshape(-1, L_N_THETA, L_N_PHI, 3)

    c00 = scatter
    c01 = jnp.roll(scatter, -1, axis=2)
    up = jnp.concatenate([scatter[:, 1:], scatter[:, -1:]], axis=1)
    c10 = up
    c11 = jnp.roll(up, -1, axis=2)
    packed = jnp.concatenate([c00, c01, c10, c11], axis=-1)      # (V,T,P,12)
    return packed.reshape(-1, 12)


def query_radiance_field(field: jnp.ndarray, pos: jnp.ndarray,
                         d: jnp.ndarray, vol: VolumeConfig,
                         field_shape: Tuple[int, int, int] | None = None
                         ) -> jnp.ndarray:
    """T*Env rgb seen from pos toward exit along d: one 12-float row gather
    + (theta, phi) bilinear. (..., 3)."""
    field_shape = field_shape or vol.field_shape
    L_N_THETA, L_N_PHI = vol.field_out_buckets
    nx, ny, nz = field_shape
    uvw = volume_ops.world_to_uvw(pos, vol.box_size, vol.box_center)
    ijk = jnp.clip((uvw * jnp.asarray(field_shape, uvw.dtype)).astype(
        jnp.int32), 0, jnp.asarray(field_shape, jnp.int32) - 1)
    vox = ijk[..., 0] * (ny * nz) + ijk[..., 1] * nz + ijk[..., 2]

    theta, phi = dir_to_theta_phi(d)
    ft = theta / math.pi * L_N_THETA - 0.5
    fp = (phi / math.pi + 1.0) * 0.5 * L_N_PHI - 0.5
    it0 = jnp.floor(ft)
    ip0 = jnp.floor(fp)
    wt = jnp.clip(ft - it0, 0.0, 1.0)
    wt = jnp.where(it0 < 0, 0.0, wt)
    wp = (fp - ip0)[..., None]
    it0c = jnp.clip(it0.astype(jnp.int32), 0, L_N_THETA - 1)
    ip0i = jnp.mod(ip0.astype(jnp.int32), L_N_PHI)

    row_idx = vox * (L_N_THETA * L_N_PHI) + it0c * L_N_PHI + ip0i
    # fields may be stored bf16 -- upcast after the gather
    rows = jnp.take(field, row_idx, axis=0).astype(pos.dtype)  # (..., 12)
    c00, c01 = rows[..., 0:3], rows[..., 3:6]
    c10, c11 = rows[..., 6:9], rows[..., 9:12]
    top = c00 + (c01 - c00) * wp
    bot = c10 + (c11 - c10) * wp
    return top + (bot - top) * wt[..., None]
