"""Density-volume sampling and ray/box geometry.

Reference equivalents:
  sky_sdf + sphere-traced find_entry_exit (nrc-train.comp:368-396)
    -> analytic slab ray/AABB intersection (branch-free, TPU-friendly);
  getDensity = densityFactor * trilinear 3D texture fetch with
    clamp-to-border black (nrc-train.comp:410-413, Texture3D border color
    src/main.cpp:124-128) -> batched gather trilerp, border handled by a
    zero-weight mask;
  GetTransmittance fixed-step quadrature (nrc-train.comp:1032-1053)
    -> vectorized: T = exp(-step * sum_i sigma(x_i)).

The density grid stays fp32 (the reference quantizes to 8 bit on upload,
Texture3D.cpp:32 -- quirk #7; apply ``quantize_density_8bit`` upstream when
parity is wanted).

All functions are shape-polymorphic over leading batch dims and contain no
data-dependent control flow, so they jit/vmap/shard cleanly.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from neuralradiancecaching_tpu.config import VolumeConfig


def ray_aabb(ro: jnp.ndarray, rd: jnp.ndarray, box_size, box_center
             ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Slab intersection of rays with the volume AABB.

    Replaces the reference's sphere-traced find_entry_exit
    (nrc-train.comp:374-396) with the closed form. For an origin inside the
    box t_entry is clamped to 0 (matching the sphere tracer, which from an
    inside point immediately terminates at the origin itself).

    Args:
      ro: (..., 3) ray origins; rd: (..., 3) unit directions.
    Returns:
      (t_entry, t_exit, hit): each (...,); hit is False for rays that miss
      (then t_entry/t_exit are meaningless but finite).
    """
    half = jnp.asarray(box_size, dtype=ro.dtype) * 0.5
    center = jnp.asarray(box_center, dtype=ro.dtype)
    inv = 1.0 / jnp.where(jnp.abs(rd) < 1e-12,
                          jnp.where(rd < 0, -1e-12, 1e-12), rd)
    t0 = (center - half - ro) * inv
    t1 = (center + half - ro) * inv
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (tmax >= jnp.maximum(tmin, 0.0))
    t_entry = jnp.maximum(tmin, 0.0)
    return t_entry, tmax, hit


def entry_exit_points(ro: jnp.ndarray, rd: jnp.ndarray, box_size, box_center
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """find_entry_exit as points: (entry (...,3), exit (...,3), hit (...,))."""
    t_in, t_out, hit = ray_aabb(ro, rd, box_size, box_center)
    return ro + t_in[..., None] * rd, ro + t_out[..., None] * rd, hit


def world_to_uvw(pos: jnp.ndarray, box_size, box_center) -> jnp.ndarray:
    """get_sky_uvw (nrc-train.comp:405-408): box -> [0,1]^3."""
    size = jnp.asarray(box_size, dtype=pos.dtype)
    center = jnp.asarray(box_center, dtype=pos.dtype)
    return (pos - center) / size + 0.5


def sample_grid_trilinear(grid: jnp.ndarray, uvw: jnp.ndarray) -> jnp.ndarray:
    """Trilinear fetch with clamp-to-border-black, GL texture semantics.

    grid: (Nx, Ny, Nz); uvw: (..., 3) in [0,1] inside the box.
    Texel centers sit at (i + 0.5)/N, so sample coords are uvw*N - 0.5.
    Out-of-range corners contribute zero (VK_SAMPLER_ADDRESS_MODE_CLAMP_TO
    _BORDER with black border, src/main.cpp:126-128).
    """
    shape = jnp.asarray(grid.shape, dtype=uvw.dtype)
    t = uvw * shape - 0.5
    i0 = jnp.floor(t)
    frac = t - i0
    i0 = i0.astype(jnp.int32)

    nx, ny, nz = grid.shape
    flat = grid.reshape(-1)

    def corner(cx, cy, cz):
        ix = i0[..., 0] + cx
        iy = i0[..., 1] + cy
        iz = i0[..., 2] + cz
        inside = ((ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
                  & (iz >= 0) & (iz < nz))
        lin = (jnp.clip(ix, 0, nx - 1) * (ny * nz)
               + jnp.clip(iy, 0, ny - 1) * nz
               + jnp.clip(iz, 0, nz - 1))
        v = jnp.take(flat, lin, axis=0)
        wx = frac[..., 0] if cx else 1.0 - frac[..., 0]
        wy = frac[..., 1] if cy else 1.0 - frac[..., 1]
        wz = frac[..., 2] if cz else 1.0 - frac[..., 2]
        return jnp.where(inside, v, 0.0) * (wx * wy * wz)

    acc = 0.0
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                acc = acc + corner(cx, cy, cz)
    return acc


def density_at(grid: jnp.ndarray, pos: jnp.ndarray,
               cfg: VolumeConfig) -> jnp.ndarray:
    """getDensity (nrc-train.comp:410-413): factor * trilinear fetch."""
    uvw = world_to_uvw(pos, cfg.box_size, cfg.box_center)
    return cfg.density_factor * sample_grid_trilinear(grid, uvw)


def transmittance(grid: jnp.ndarray, start: jnp.ndarray, end: jnp.ndarray,
                  steps: int, cfg: VolumeConfig) -> jnp.ndarray:
    """GetTransmittance (nrc-train.comp:1032-1053): fixed-step quadrature.

    Samples at start + (i/steps)*(end-start) for i in [0, steps); equals
    exp(-step_size * sum_i sigma_i). A zero-length segment returns 1.

    start/end: (..., 3) -> (...,).
    """
    seg = end - start
    length = jnp.linalg.norm(seg, axis=-1)
    step_size = length / steps
    fracs = jnp.arange(steps, dtype=start.dtype) / steps  # (S,)
    pts = start[..., None, :] + fracs[:, None] * seg[..., None, :]  # (...,S,3)
    dens = density_at(grid, pts, cfg)  # (..., S)
    optical = step_size * jnp.sum(dens, axis=-1)
    t = jnp.exp(-optical)
    return jnp.where(length > 0.0, t, 1.0)


def quantize_8bit(grid: jnp.ndarray) -> jnp.ndarray:
    """Quirk #7 (Texture3D.cpp:25-40): density quantized to 8-bit UNORM."""
    return jnp.round(jnp.clip(grid, 0.0, 1.0) * 255.0) / 255.0
