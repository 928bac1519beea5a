"""One-blob direction encoding: 16 Gaussian bins for theta and for phi.

Reference nrc-train.comp:344-365 / nrc-forward.frag:254-278:
  theta = atan2(z, x)/pi + 0.5            in [0, 1]
  phi   = atan2(|xz|, y)/pi + 0.5         in [0.5, 1.5]   (reference)
  feature[i]      = NormGauss(i, theta, sigma=1/4)
  feature[i + 16] = NormGauss(i, phi,   sigma=1/4)

As written in the reference only the first couple of bins can ever fire
(the Gaussian mean lives in [0,1] but is evaluated at integer i up to 15).
The fixed default spreads the blob across all bins by evaluating
NormGauss(i, K*x, K*sigma) and maps phi to [0,1]; set
``QuirkFlags.raw_oneblob`` for the literal reference formula.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from neuralradiancecaching_tpu.config import OneBlobConfig, QuirkFlags


def norm_gauss(x: jnp.ndarray, mean: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Gaussian pdf (nrc-train.comp:344-350)."""
    z = (x - mean) / sigma
    return (1.0 / (sigma * math.sqrt(2.0 * math.pi))) * jnp.exp(-0.5 * z * z)


def dir_to_angles(direction: jnp.ndarray, raw: bool) -> jnp.ndarray:
    """Map a unit direction to (theta, phi) in [0,1]^2 (nrc-train.comp:355-356).

    direction: (..., 3). Returns (..., 2).
    """
    x, y, z = direction[..., 0], direction[..., 1], direction[..., 2]
    theta = jnp.arctan2(z, x) / math.pi + 0.5
    phi = jnp.arctan2(jnp.sqrt(x * x + z * z), y) / math.pi
    if raw:
        phi = phi + 0.5  # the reference's out-of-range [0.5, 1.5] mapping
    return jnp.stack([theta, phi], axis=-1)


def encode_angles(angles: jnp.ndarray, cfg: OneBlobConfig,
                  raw: bool) -> jnp.ndarray:
    """angles: (..., A) in [0,1] -> (..., A*n_bins), bin-major per angle."""
    k = cfg.n_bins
    bins = jnp.arange(k, dtype=angles.dtype)
    if raw:
        mean = angles[..., None]
        sigma = cfg.sigma
    else:
        mean = angles[..., None] * k
        sigma = cfg.sigma * k
    feats = norm_gauss(bins, mean, sigma)  # (..., A, K)
    return feats.reshape(*angles.shape[:-1], angles.shape[-1] * k)


def encode_dir(direction: jnp.ndarray, cfg: OneBlobConfig,
               quirks: QuirkFlags) -> jnp.ndarray:
    """Unit direction (..., 3) -> (..., 2*n_bins): [theta bins | phi bins]."""
    angles = dir_to_angles(direction, quirks.raw_oneblob)
    return encode_angles(angles, cfg, quirks.raw_oneblob)
