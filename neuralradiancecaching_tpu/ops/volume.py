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

import jax
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


# ---------------------------------------------------------------------------
# Corner-table fast path
#
# TPU gathers cost ~the same per ROW as per element (measured ~55M (1,8)-row
# gathers/s vs ~110M scalar gathers/s on v5e), so the 8 separate corner
# fetches of a trilinear sample are replaced by ONE row gather from a
# precomputed (P, 8) table holding each cell's corner values. 8x memory
# (~53 MB for the cloud grid), ~4x sampling throughput. This is the TPU
# equivalent of the GPU's hardware trilinear texture unit.
# ---------------------------------------------------------------------------

@jax.jit
def build_corner_table(grid: jnp.ndarray) -> jnp.ndarray:
    """(Nx, Ny, Nz) density grid -> ((Nx+1)*(Ny+1)*(Nz+1), 8) corner table.

    Base cell b=(i,j,k) with i in [-1, Nx-1] (stored shifted +1) holds the 8
    corners grid[i+di, j+dj, k+dk] (x-major corner order, di*4+dj*2+dk),
    with out-of-range corners = 0 (clamp-to-border black).
    """
    nx, ny, nz = grid.shape
    padded = jnp.zeros((nx + 2, ny + 2, nz + 2), dtype=grid.dtype)
    padded = padded.at[1:-1, 1:-1, 1:-1].set(grid)
    slices = []
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                slices.append(padded[dx:dx + nx + 1, dy:dy + ny + 1,
                                     dz:dz + nz + 1])
    table = jnp.stack(slices, axis=-1)  # (Nx+1, Ny+1, Nz+1, 8)
    return table.reshape(-1, 8)


def sample_corner_trilinear(table: jnp.ndarray, uvw: jnp.ndarray,
                            grid_shape) -> jnp.ndarray:
    """Trilinear fetch from a corner table: ONE row gather per sample.

    Bit-equivalent to :func:`sample_grid_trilinear` (tested); clamp-to-border
    black for uvw outside [0,1].
    """
    nx, ny, nz = grid_shape
    shape = jnp.asarray((nx, ny, nz), dtype=uvw.dtype)
    t = uvw * shape - 0.5
    i0f = jnp.floor(t)
    frac = t - i0f
    i0 = i0f.astype(jnp.int32)

    valid = jnp.all((i0 >= -1) & (i0 <= shape.astype(jnp.int32) - 1), axis=-1)
    b = jnp.clip(i0 + 1, 0, jnp.asarray((nx, ny, nz), jnp.int32))
    flat = (b[..., 0] * ((ny + 1) * (nz + 1)) + b[..., 1] * (nz + 1)
            + b[..., 2])
    rows = jnp.take(table, flat, axis=0)  # (..., 8)

    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    gx, gy, gz = 1.0 - fx, 1.0 - fy, 1.0 - fz
    # corner order dx*4 + dy*2 + dz; explicit products (a stacked outer
    # product would materialize a (..., 2, 2, 2) intermediate that blows up
    # HBM on big batched quadratures)
    w = jnp.stack([gx * gy * gz, gx * gy * fz, gx * fy * gz, gx * fy * fz,
                   fx * gy * gz, fx * gy * fz, fx * fy * gz, fx * fy * fz],
                  axis=-1)
    val = jnp.sum(rows * w, axis=-1)
    return jnp.where(valid, val, 0.0)


def density_at(field: jnp.ndarray, pos: jnp.ndarray,
               cfg: VolumeConfig) -> jnp.ndarray:
    """getDensity (nrc-train.comp:410-413): factor * trilinear fetch.

    ``field`` is a corner table from :func:`build_corner_table` (fast path)
    or the raw (Nx, Ny, Nz) grid (reference path) -- distinguished by rank.
    """
    uvw = world_to_uvw(pos, cfg.box_size, cfg.box_center)
    if field.ndim == 2:
        return cfg.density_factor * sample_corner_trilinear(
            field, uvw, cfg.grid_shape)
    return cfg.density_factor * sample_grid_trilinear(field, uvw)


def transmittance(field: jnp.ndarray, start: jnp.ndarray, end: jnp.ndarray,
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
    dens = density_at(field, pts, cfg)  # (..., S)
    optical = step_size * jnp.sum(dens, axis=-1)
    t = jnp.exp(-optical)
    return jnp.where(length > 0.0, t, 1.0)


def quantize_8bit(grid: jnp.ndarray) -> jnp.ndarray:
    """Quirk #7 (Texture3D.cpp:25-40): density quantized to 8-bit UNORM."""
    return jnp.round(jnp.clip(grid, 0.0, 1.0) * 255.0) / 255.0


def transmittance_ratio(field: jnp.ndarray, start: jnp.ndarray,
                        end: jnp.ndarray, key: jax.Array, steps: int,
                        sigma_maj: jnp.ndarray, cfg: VolumeConfig
                        ) -> jnp.ndarray:
    """UNBIASED segment transmittance by ratio tracking, batched.

    T_hat = prod_k (1 - sigma(x_k)/sigma_maj) over Woodcock candidates
    x_k at distances cumsum(Exp(sigma_maj)) <= |end - start|;
    E[T_hat] = exp(-integral sigma) exactly for any sigma_maj >= sigma
    (the classic null-collision identity). Like the batched delta sampler
    (render/pathtrace.py), the candidates are density-independent, so the
    whole estimate is ONE batched gather + a masked product -- no
    sequential walk. A candidate budget that exhausts before the segment
    end leaves the remaining factors at 1 (same truncation semantics as
    delta_null_steps; negligible for steps covering sigma_maj * length).

    This goes BEYOND the reference's 32-step quadrature
    (nrc-train.comp:1032-1053, which carries O(step^2) bias) -- the
    ground-truth transmittance for parity runs.

    start/end: (..., 3) -> (...,).
    """
    seg = end - start
    length = jnp.linalg.norm(seg, axis=-1)
    dirn = seg / jnp.maximum(length, 1e-12)[..., None]
    u = jax.random.uniform(key, (steps,) + length.shape, dtype=start.dtype)
    t_cand = jnp.cumsum(-jnp.log1p(-u), axis=0) / sigma_maj
    x = start[None] + jnp.minimum(t_cand, length[None])[..., None] \
        * dirn[None]
    rho = density_at(field, x, cfg)
    f = jnp.where(t_cand <= length[None], 1.0 - rho / sigma_maj, 1.0)
    return jnp.where(length > 0.0, jnp.prod(f, axis=0), 1.0)


def majorant_grid(grid: jnp.ndarray, cells: Tuple[int, int, int]
                  ) -> jnp.ndarray:
    """Dilated coarse max-density grid for local-majorant delta tracking.

    Returns a (cx, cy, cz) grid where cell c bounds the TRILINEAR density
    anywhere within one cell edge of c:

      1. fine 3x3x3 max dilation -- a trilinear sample at p reads corners
         up to 1 texel from p's voxel (sample coords uvw*N - 0.5, see
         :func:`sample_grid_trilinear`), so each fine voxel must carry its
         neighbourhood max;
      2. block-reduce into cells of ceil(N/c) voxels (zero-padded: border
         is clamp-to-border black);
      3. coarse 3x3x3 max dilation -- a segment point p whose nearest
         majorant sample (spacing <= one cell edge) landed in an adjacent
         cell is still bounded.

    Together: maj[cell(q)] >= density(p) for every p with |p - q|_inf <=
    one cell edge, which is what the batched Woodcock sampler's
    midpoint-sampled per-event majorant requires (render/pathtrace.py).
    The grid is raw density -- multiply by density_factor at use, like
    :func:`density_at`.
    """
    g = jax.lax.reduce_window(grid, 0.0, jax.lax.max, (3, 3, 3),
                              (1, 1, 1), "SAME")
    f = [-(-n // c) for n, c in zip(grid.shape, cells)]
    pad = [(0, c * fi - n) for n, c, fi in zip(grid.shape, cells, f)]
    g = jnp.pad(g, pad)
    g = g.reshape(cells[0], f[0], cells[1], f[1],
                  cells[2], f[2]).max(axis=(1, 3, 5))
    return jax.lax.reduce_window(g, 0.0, jax.lax.max, (3, 3, 3),
                                 (1, 1, 1), "SAME")
