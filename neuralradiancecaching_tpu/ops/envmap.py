"""HDR environment map: equirect lookup + inverse-CDF importance sampling.

Reference: HdrEnvMap.cpp (RGBA32F equirect texture + R32F inverse-CDF images)
and read_file.cpp:123-206 (CDF build + inversion on the host);
lookup/sampling in nrc-forward.frag:690-749.

TPU-native design: the env map and both inverse CDFs are plain jax.Arrays;
the CDF build is a couple of cumsums + a vectorized searchsorted-style
inversion (the reference's InvertCdf linear scan, read_file.cpp:123-139,
becomes ``jnp.searchsorted``); lookups are bilinear gathers.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from neuralradiancecaching_tpu.config import EnvMapConfig, QuirkFlags


class EnvMap(NamedTuple):
    """Scene env-map state (the reference's set-5 descriptor set)."""

    image: jnp.ndarray      # (H, W, 3) linear radiance
    # corner-packed rows for one-gather bilinear fetches: row (y*W + x) =
    # [rgb(x,y) | rgb(x+1,y) | rgb(x,y+1) | rgb(x+1,y+1)] with u wraparound
    # and v clamp baked in (same trick as the volume corner table)
    corner: jnp.ndarray     # (H*W, 12)
    inv_cdf_x: jnp.ndarray  # (H, W)  u -> phi_norm, conditioned on row
    inv_cdf_y: jnp.ndarray  # (H,)    u -> theta_norm
    direct_strength: jnp.ndarray  # scalar
    hpm_strength: jnp.ndarray     # scalar


def invert_cdf(cdf: jnp.ndarray) -> jnp.ndarray:
    """InvertCdf (read_file.cpp:123-139): invCdf[i] = p/N where p is the
    first index with cdf[p] >= i/N.

    cdf: (..., N) monotone in [0,1] -> (..., N).
    """
    n = cdf.shape[-1]
    thresholds = jnp.arange(n, dtype=cdf.dtype) / n
    # reference uses 'while cdf[p] < t: p++' => first p with cdf[p] >= t
    idx = jax.vmap(lambda c: jnp.searchsorted(c, thresholds, side="left"))(
        cdf.reshape(-1, n)).reshape(cdf.shape)
    return idx.astype(cdf.dtype) / n


@jax.jit
def build_inverse_cdfs(image: jnp.ndarray):
    """Hdr4fToCdf (read_file.cpp:141-206): per-row conditional CDF over x
    (brightness = r+g+b) and marginal CDF over y, both inverted.

    image: (H, W, 3). Returns (inv_cdf_x (H, W), inv_cdf_y (H,)).
    """
    brightness = jnp.sum(image, axis=-1)  # (H, W)
    row_sum = jnp.sum(brightness, axis=1, keepdims=True)  # (H, 1)
    cdf_x = jnp.cumsum(brightness, axis=1) / jnp.maximum(row_sum, 1e-20)
    cdf_y = jnp.cumsum(row_sum[:, 0])
    cdf_y = cdf_y / jnp.maximum(cdf_y[-1], 1e-20)
    inv_x = invert_cdf(cdf_x)
    inv_y = invert_cdf(cdf_y[None, :])[0]
    return inv_x, inv_y


@jax.jit
def build_env_corner_table(image: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) -> (H*W, 12) with the 4 bilinear corners per row."""
    right = jnp.roll(image, -1, axis=1)  # u wraps (equirect seam)
    down = jnp.concatenate([image[1:], image[-1:]], axis=0)  # v clamps
    down_right = jnp.roll(down, -1, axis=1)
    packed = jnp.concatenate([image, right, down, down_right], axis=-1)
    return packed.reshape(-1, 12)


def make_envmap(image: jnp.ndarray, cfg: EnvMapConfig) -> EnvMap:
    image = image.astype(jnp.float32)
    inv_x, inv_y = build_inverse_cdfs(image)
    return EnvMap(
        image=image,
        corner=build_env_corner_table(image),
        inv_cdf_x=inv_x,
        inv_cdf_y=inv_y,
        direct_strength=jnp.float32(cfg.direct_strength),
        hpm_strength=jnp.float32(cfg.hpm_strength),
    )


def _bilinear_wrap_u(image: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear fetch from (H, W, C); u wraps (equirect seam), v clamps.

    uv: (..., 2) in [0,1]. Reference 4-gather form (tests + CDF radiance).
    """
    h, w = image.shape[0], image.shape[1]
    tu = uv[..., 0] * w - 0.5
    tv = uv[..., 1] * h - 0.5
    iu0 = jnp.floor(tu)
    iv0 = jnp.floor(tv)
    fu = tu - iu0
    fv = tv - iv0
    iu0 = iu0.astype(jnp.int32)
    iv0 = iv0.astype(jnp.int32)

    flat = image.reshape(-1, image.shape[-1])

    def fetch(iu, iv):
        iu = jnp.mod(iu, w)
        iv = jnp.clip(iv, 0, h - 1)
        return jnp.take(flat, iv * w + iu, axis=0)

    c00 = fetch(iu0, iv0)
    c10 = fetch(iu0 + 1, iv0)
    c01 = fetch(iu0, iv0 + 1)
    c11 = fetch(iu0 + 1, iv0 + 1)
    top = c00 + (c10 - c00) * fu[..., None]
    bot = c01 + (c11 - c01) * fu[..., None]
    return top + (bot - top) * fv[..., None]


def bilinear_lookup(env: EnvMap, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear fetch via the corner table: ONE row gather per sample
    (equivalent to :func:`_bilinear_wrap_u`, tested)."""
    h, w = env.image.shape[0], env.image.shape[1]
    tu = uv[..., 0] * w - 0.5
    tv = uv[..., 1] * h - 0.5
    iu0 = jnp.floor(tu)
    iv0 = jnp.floor(tv)
    fu = tu - iu0
    # top-edge clamp: both v-corners are row 0, so force fv = 0 there
    fv = jnp.where(iv0 < 0, 0.0, tv - iv0)
    iu = jnp.mod(iu0.astype(jnp.int32), w)
    iv = jnp.clip(iv0.astype(jnp.int32), 0, h - 1)
    rows = jnp.take(env.corner, iv * w + iu, axis=0)  # (..., 12)
    c00, c10 = rows[..., 0:3], rows[..., 3:6]
    c01, c11 = rows[..., 6:9], rows[..., 9:12]
    top = c00 + (c10 - c00) * fu[..., None]
    bot = c01 + (c11 - c01) * fu[..., None]
    return top + (bot - top) * fv[..., None]


def dir_to_equirect_uv(direction: jnp.ndarray) -> jnp.ndarray:
    """uv = (atan2(z,x), asin(y)) * (0.1591, 0.3183) + 0.5
    (nrc-forward.frag:690-701)."""
    x, y, z = direction[..., 0], direction[..., 1], direction[..., 2]
    u = jnp.arctan2(z, x) * (1.0 / (2.0 * math.pi)) + 0.5
    v = jnp.arcsin(jnp.clip(y, -1.0, 1.0)) * (1.0 / math.pi) + 0.5
    return jnp.stack([u, v], axis=-1)


def sample_direct(env: EnvMap, direction: jnp.ndarray,
                  hpm: bool) -> jnp.ndarray:
    """SampleHdrEnvMap(dir, hpm) (nrc-forward.frag:703-708): radiance seen
    looking along `direction`, scaled by the chosen strength."""
    uv = dir_to_equirect_uv(direction)
    rgb = bilinear_lookup(env, uv)
    strength = env.hpm_strength if hpm else env.direct_strength
    return rgb * strength


def importance_sample(env: EnvMap, key: jax.Array, shape,
                      quirks: QuirkFlags):
    """Inverse-CDF draw of (direction, radiance, theta/phi norm).

    Implements the reference's dead-code branch (nrc-forward.frag:728-744)
    for real: thetaNorm = invCdfY(u1); phiNorm = invCdfX(u2 | thetaNorm);
    direction from spherical angles (fixed formula by default; the
    ``raw_envmap_dir`` quirk reproduces the reference's non-normalized
    sin(theta*pi)*(cos, 1, sin) vector).

    Returns (dir (...,3), radiance (...,3)): radiance is the raw env texel
    at (phiNorm, thetaNorm) NOT scaled by strength (the caller applies
    hpm_strength, matching frag:741).
    """
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, shape)
    u2 = jax.random.uniform(k2, shape)

    h, w = env.image.shape[0], env.image.shape[1]
    # nearest-texel lookups of the inverse CDFs (R32F images, nearest is
    # what the reference's texture() with unnormalized data effectively does
    # at CDF resolution)
    theta_norm = jnp.take(env.inv_cdf_y,
                          jnp.clip((u1 * h).astype(jnp.int32), 0, h - 1))
    row = jnp.clip((theta_norm * h).astype(jnp.int32), 0, h - 1)
    col = jnp.clip((u2 * w).astype(jnp.int32), 0, w - 1)
    phi_norm = env.inv_cdf_x[row, col]

    if quirks.raw_envmap_dir:
        # reference frag:736 -- y component is sin(theta*pi), not cos; the
        # vector is not normalized
        st = jnp.sin(theta_norm * math.pi)
        direction = jnp.stack([st * jnp.cos(phi_norm * 2.0 * math.pi),
                               st,
                               st * jnp.sin(phi_norm * 2.0 * math.pi)],
                              axis=-1)
    else:
        # proper spherical direction consistent with the equirect param:
        # v = theta_norm is the image row; asin(y)/pi + 0.5 = v
        # => y = sin((v - 0.5) * pi);  u = phi_norm => azimuth 2 pi (u - 0.5)
        y = jnp.sin((theta_norm - 0.5) * math.pi)
        r = jnp.sqrt(jnp.maximum(0.0, 1.0 - y * y))
        az = (phi_norm - 0.5) * (2.0 * math.pi)
        direction = jnp.stack([r * jnp.cos(az), y, r * jnp.sin(az)], axis=-1)

    uv = jnp.stack([phi_norm, theta_norm], axis=-1)
    radiance = bilinear_lookup(env, uv)
    return direction, radiance
