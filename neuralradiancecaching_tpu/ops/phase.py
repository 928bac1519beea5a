"""Henyey-Greenstein phase function and direction sampling.

Reference: hg_phase_func (nrc-train.comp:415-421) and NewRayDir
(nrc-train.comp:436-471) which samples the HG inversion formula for
cos(theta) and then applies two axis-angle rotations.

TPU-native design: instead of building 4x4 rotation matrices per sample we
construct an orthonormal basis around the old direction and compose the new
direction directly -- same distribution, ~5x fewer flops, no matrix ops in
the scalar path. Random numbers come from counter-based ``jax.random``
(threefry) instead of the reference's fract-sin chain (statistical, not
bitwise fidelity -- SURVEY.md §7 'hard parts').
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def hg_phase(cos_theta: jnp.ndarray, g) -> jnp.ndarray:
    """Henyey-Greenstein phase (nrc-train.comp:415-421).

    NOTE: the reference uses the 2D normalization 0.5*(1-g^2)/(...)^1.5
    rather than the solid-angle 1/(4 pi) factor; we match it exactly since
    the cache is trained against these magnitudes.
    """
    g = jnp.asarray(g, dtype=cos_theta.dtype)
    g2 = g * g
    return 0.5 * (1.0 - g2) / jnp.power(1.0 + g2 - 2.0 * g * cos_theta, 1.5)


def sample_hg_cos_theta(u: jnp.ndarray, g) -> jnp.ndarray:
    """Inverse-CDF sample of HG cos(theta) (nrc-train.comp:449-459).

    u: uniforms in [0,1). Isotropic fallback for |g| < 1e-3.
    """
    g = jnp.asarray(g, dtype=u.dtype)
    safe_g = jnp.where(jnp.abs(g) < 1e-3, 1e-3, g)
    sqr = (1.0 - safe_g * safe_g) / (1.0 - safe_g + 2.0 * safe_g * u)
    aniso = (1.0 + safe_g * safe_g - sqr * sqr) / (2.0 * safe_g)
    iso = 1.0 - 2.0 * u
    cos_theta = jnp.where(jnp.abs(g) < 1e-3, iso, aniso)
    return jnp.clip(cos_theta, -1.0, 1.0)


def orthonormal_basis(d: jnp.ndarray):
    """Two unit vectors orthogonal to unit d (..., 3).

    Uses the reference's branch (nrc-train.comp:445): z < x picks
    (y, -x, 0) else (0, -z, y), normalized; the bitangent completes the frame.
    """
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    zeros = jnp.zeros_like(x)
    t = jnp.where((z < x)[..., None],
                  jnp.stack([y, -x, zeros], axis=-1),
                  jnp.stack([zeros, -z, y], axis=-1))
    t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
    b = jnp.cross(d, t)
    return t, b


def hg_direction_from_uniforms(u_cos: jnp.ndarray, u_phi: jnp.ndarray,
                               old_dir: jnp.ndarray, g) -> jnp.ndarray:
    """NewRayDir core with caller-provided uniforms (lets hot loops draw
    all randomness in one batched threefry call)."""
    old_dir = old_dir / jnp.linalg.norm(old_dir, axis=-1, keepdims=True)
    cos_t = sample_hg_cos_theta(u_cos, g)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = u_phi * (2.0 * math.pi)
    t, b = orthonormal_basis(old_dir)
    new_dir = (cos_t[..., None] * old_dir
               + (sin_t * jnp.cos(phi))[..., None] * t
               + (sin_t * jnp.sin(phi))[..., None] * b)
    return new_dir / jnp.linalg.norm(new_dir, axis=-1, keepdims=True)


def sample_hg_direction(key: jax.Array, old_dir: jnp.ndarray, g
                        ) -> jnp.ndarray:
    """NewRayDir (nrc-train.comp:436-471): scatter old_dir by an HG-sampled
    polar angle and a uniform azimuth.

    old_dir: (..., 3) unit directions; returns (..., 3) unit directions.
    Batched: one key, uniforms drawn per element.
    """
    k_ct, k_phi = jax.random.split(key)
    u = jax.random.uniform(k_ct, old_dir.shape[:-1], dtype=old_dir.dtype)
    u_phi = jax.random.uniform(k_phi, old_dir.shape[:-1],
                               dtype=old_dir.dtype)
    return hg_direction_from_uniforms(u, u_phi, old_dir, g)


def uniform_sphere(key: jax.Array, shape, dtype=jnp.float32) -> jnp.ndarray:
    """Uniform directions on S^2, shape (..., 3)."""
    k1, k2 = jax.random.split(key)
    z = jax.random.uniform(k1, shape, dtype=dtype) * 2.0 - 1.0
    phi = jax.random.uniform(k2, shape, dtype=dtype) * (2.0 * math.pi)
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    return jnp.stack([r * jnp.cos(phi), z, r * jnp.sin(phi)], axis=-1)
